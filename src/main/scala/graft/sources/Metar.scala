package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** METAR weather-report decoding — the reference's ingest path for the
  * pressure series behind indicated-altitude correction
  * (reference metar/metar.go:16 Report{}, metar/noaa.go:18 parseNOAA,
  * metar/ogimet.go:20 OgimetPreParse / :47 OgimetParse).
  *
  * Everything is codegen'd built-ins (regexp_extract / HOF folds) over
  * DataFrame columns — raw feed blobs decode in parallel across input
  * splits, no driver-side parsing.
  */
object Metar {

  /** Standard sea-level pressure, inches of mercury (metar/metar.go:10). */
  val StandardPressureInHg = 29.9213

  /** Ogimet text-archive pre-parse (ogimet.go:20 OgimetPreParse): drop
    * comment (`#`) and blank lines, glue continuation lines — a record ends
    * at a line whose last char is `=`. One blob in, array of record strings
    * out; a trailing unterminated fragment is dropped (same as the
    * reference, whose `curr` dies with the scanner).
    */
  def ogimetPreParse(blob: Column): Column = {
    val glued = aggregate(
      // split pattern is a regex: tolerate CRLF payloads (trim() strips
      // only spaces, so a trailing \r would defeat the '=' terminator)
      split(blob, "\r?\n"),
      struct(array().cast("array<string>").as("done"), lit("").as("curr")),
      (acc, raw) => {
        val l = trim(raw)
        val curr2 = concat(acc.getField("curr"), l)
        when(length(l) === 0 || l.startsWith("#"), acc)
          .otherwise(when(l.endsWith("="),
            struct(array_append(acc.getField("done"), curr2).as("done"),
              lit("").as("curr")))
          .otherwise(
            struct(acc.getField("done").as("done"),
              concat(curr2, lit(" ")).as("curr"))))
      },
      acc => acc.getField("done"))
    glued
  }

  /** Decode raw METAR text (the `raw_text` / ogimet record shape) into
    * typed columns, appended to the input:
    *
    *  - `metar_station`: ICAO id — first body token, `[A-Z][A-Z0-9]{3}`
    *  - `metar_day`/`metar_hour`/`metar_min`: the `DDHHMMZ` group
    *  - `metar_inhg`: altimeter setting from the `A####` token (inHg /100,
    *    e.g. A3006 → 30.06) — null when the report carries none
    *  - `metar_ts`: full timestamp from the 12-digit ogimet prefix
    *    (`201601070156 METAR KSFO 070156Z …` — ogimet.go:44) when present,
    *    null for bare NOAA-style raw text (whose full time arrives in the
    *    envelope's observation_time column, not the METAR body)
    *
    * Unparseable fields are null, never errors — poison rows survive for
    * anti-join triage, the same tolerance contract as JsonFeed.
    */
  def parseRaw(df: DataFrame, text: Column): DataFrame = {
    val pfx = regexp_extract(text, "^([0-9]{12}) ", 1)
    val body = regexp_replace(text, "^[0-9]{12} ", "")
    val core = regexp_replace(body, "^(METAR|SPECI) ", "")
    val station = regexp_extract(core, "^([A-Z][A-Z0-9]{3})[ =]", 1)
    val dhm = regexp_extract(core, "\\b([0-9]{6})Z\\b", 1)
    val alt4 = regexp_extract(body, "\\bA([0-9]{4})\\b", 1)
    df.withColumn("metar_station", when(station =!= "", station))
      .withColumn("metar_day",
        when(dhm =!= "", substring(dhm, 1, 2).cast("int")))
      .withColumn("metar_hour",
        when(dhm =!= "", substring(dhm, 3, 2).cast("int")))
      .withColumn("metar_min",
        when(dhm =!= "", substring(dhm, 5, 2).cast("int")))
      .withColumn("metar_inhg",
        when(alt4 =!= "", alt4.cast("int") / 100.0))
      .withColumn("metar_ts",
        // try_: a 12-digit prefix that isn't a valid datetime (month 13,
        // corrupt archive line) must null out, not throw — Spark 4 runs
        // ANSI by default and to_timestamp would fail the batch
        when(pfx =!= "", try_to_timestamp(pfx, lit("yyyyMMddHHmm"))))
  }

  /** Decode a NOAA dataserver CSV payload (noaa.go:18 parseNOAA) into one
    * report row per data line: skip the preamble (everything through the
    * `N results` line), read the HEADER line to locate the columns —
    * position-independent, like the reference's header map — and keep rows
    * with a non-empty `altim_in_hg`. Output:
    * (id, raw_text, station_id, observation_time, altim_in_hg).
    *
    * Simplification vs the reference's csv.Reader: fields are split on
    * bare commas. The feed's fields are METAR text and numbers — no quoted
    * commas in the format — so this holds for the documented envelope;
    * a quoted-field feed would want a from_csv schema instead.
    *
    * Relational shape: blobs explode to (id, pos, line); the per-blob
    * preamble mark and header positions join back on the blob id, so any
    * number of blobs (one per fetch window, say) decode in one plan.
    */
  def parseNoaaCsv(df: DataFrame, id: String, blob: String): DataFrame = {
    val lines = df.select(col(id),
        posexplode(split(col(blob), "\r?\n")).as(Seq("pos", "line")))
      .withColumn("line", trim(col("line")))
    val mark = lines
      .where(col("line").rlike("^[0-9]+ results$"))
      .groupBy(id).agg(min("pos").as("_mark"))
    // A blob whose header lacks one of the four columns decodes to zero
    // rows (the position guard below) rather than erroring: Spark 4 runs
    // ANSI by default, where element_at(_, 0) — array_position's missing
    // marker — throws. Same poison contract as the JSON feeds: envelope
    // drift and garbled lines drop rows, never the batch (try_element_at
    // nulls a too-short line, try_to_timestamp/try_cast null bad values).
    val hdr = lines.join(mark, id)
      .where(col("pos") === col("_mark") + 1)
      .select(col(id), split(col("line"), ",").as("_hdr"))
      .select(col(id),
        array_position(col("_hdr"), "raw_text").as("_p_raw"),
        array_position(col("_hdr"), "station_id").as("_p_sta"),
        array_position(col("_hdr"), "observation_time").as("_p_obs"),
        array_position(col("_hdr"), "altim_in_hg").as("_p_alt"))
      .where(col("_p_raw") > 0 && col("_p_sta") > 0 &&
        col("_p_obs") > 0 && col("_p_alt") > 0)
    lines.join(mark, id).join(hdr, id)
      .where(col("pos") > col("_mark") + 1 && length(col("line")) > 0)
      .withColumn("_f", split(col("line"), ","))
      .select(col(id),
        try_element_at(col("_f"), col("_p_raw").cast("int")).as("raw_text"),
        try_element_at(col("_f"), col("_p_sta").cast("int")).as("station_id"),
        try_to_timestamp(
          try_element_at(col("_f"), col("_p_obs").cast("int")),
          lit("yyyy-MM-dd'T'HH:mm:ss'Z'")).as("observation_time"),
        try_element_at(col("_f"), col("_p_alt").cast("int")).as("_alt"))
      .where(col("_alt").isNotNull && col("_alt") =!= "" &&
        col("observation_time").isNotNull)
      .withColumn("altim_in_hg", expr("try_cast(_alt AS DOUBLE)"))
      .where(col("altim_in_hg").isNotNull)
      .drop("_alt")
  }

  /** Assemble reports into the reference's hourly archive
    * (metar.go Archive.Add: one slot per (station, UTC day, hour), the
    * LATEST report in the hour wins — feeds arrive time-descending with
    * sub-hourly SPECI extras). One shuffle on the slot key; `max(struct)`
    * picks by observation_time with map-side partials. Point-in-time
    * lookup over the archive (metar.go Lookup: the slot's report may be
    * later than the ask — rewind an hour) is the as-of join the catalog
    * already exercises (q_indicated_alt / TimeSeries.asOfJoin).
    */
  def archiveHourly(reports: DataFrame): DataFrame =
    reports
      .withColumn("day_s",
        (unix_timestamp(col("observation_time")).cast("long") / 86400).cast("long") * 86400)
      // hour from the SAME epoch arithmetic as day_s — hour() reads the
      // session timezone, so in a non-UTC session the slot key would mix
      // a UTC day with a local hour
      .withColumn("hour",
        ((unix_timestamp(col("observation_time")).cast("long") % 86400) / 3600).cast("int"))
      .groupBy("station_id", "day_s", "hour")
      .agg(max(struct(col("observation_time"), col("altim_in_hg"), col("raw_text"))).as("_r"))
      .select(col("station_id"), col("day_s"), col("hour"),
        col("_r.observation_time").as("observation_time"),
        col("_r.altim_in_hg").as("altim_in_hg"),
        col("_r.raw_text").as("raw_text"))
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Cdc, Ref}
import graft.ops._

/** Conduit-processor queries for the correctness gate: each wraps a
  * test table into OpenCDC records ([[Cdc.wrap]]), runs the processor
  * chain, and projects plain typed columns back out so the DuckDB
  * oracle can replicate the result in ANSI SQL. The processor
  * *mechanism* (JSON path edits, templates, error routing) runs for
  * real on every row; conformance against the reference's golden
  * vectors is covered in the ScalaTest specs.
  */
object Processors {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def pget(field: String): Column =
    get_json_object(col(Cdc.PayloadAfter), s"$$.$field")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Batch CDC-log compaction: the TABLE a create/update/delete log
    // describes — latest record per key under a total (pos, id) order,
    // delete tombstones dropping the key. Events replay as the log:
    // error = delete, everything else = upsert.
    "cdc_materialize" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val pos =
        if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          expr("ts div 1000000000")
        else unix_timestamp(col("ts"))
      val log = ev.select(col("user_id"), col("event_id"), pos.as("pos"),
        when(col("event_type") === "error", lit("delete"))
          .otherwise(lit("update")).as("op"),
        col("value"))
      Cdc.materializeLatest(log, Seq("user_id"),
          Seq(col("pos"), col("event_id")), "op")
        .select(col("user_id"), col("event_id"), col("pos"), col("value"))
    }),

    // Incremental aggregate view maintenance: the per-value-bucket
    // (count, sum) view built at the Jan-16 snapshot, then maintained
    // to the end of the log by delta processing ONLY — the base is
    // touched by one semi-join prune, never re-aggregated. Oracle:
    // full recompute over the whole log (the independent path the
    // incremental math must reproduce bit-for-bit through decimal).
    "cdc_incr_agg" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val pos =
        if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          expr("ts div 1000000000")
        else unix_timestamp(col("ts"))
      val log = ev.select(col("user_id"), col("event_id"), pos.as("pos"),
        when(col("event_type") === "error", lit("delete"))
          .otherwise(lit("update")).as("op"),
        col("value"))
      val splitPos = 1705363200L // 2024-01-16T00:00:00Z
      val t0 = Cdc.materializeLatest(log.filter(col("pos") <= splitPos),
        Seq("user_id"), Seq(col("pos"), col("event_id")), "op")
      val bucket = expr("CAST(floor(value / 100) AS BIGINT)")
      val v0 = t0.groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).as("sv"))
      Cdc.maintainGroupedAgg(v0, t0, log.filter(col("pos") > splitPos),
          Seq("user_id"), Seq(col("pos"), col("event_id")), "op",
          bucket, col("value").cast("decimal(18,2)"))
        .select(col("bucket"), col("cnt"),
          col("sv").cast("double").as("sum_value"))
    }),

    // SCD Type-2 dimension history from the same replayed CDC log:
    // every surviving version with its [valid_from, valid_to) span,
    // deletes closing the prior version without emitting one. One key
    // shuffle + lead() window; twin of cdc_materialize (which keeps
    // only each chain's head).
    "cdc_scd2" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val pos =
        if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          expr("ts div 1000000000")
        else unix_timestamp(col("ts"))
      val log = ev.select(col("user_id"), col("event_id"), pos.as("pos"),
        when(col("event_type") === "error", lit("delete"))
          .otherwise(lit("update")).as("op"),
        col("value"))
      Cdc.scd2(log, Seq("user_id"), Seq(col("pos"), col("event_id")),
          col("pos"), "op")
        .select(col("user_id"), col("event_id"), col("valid_from"),
          col("valid_to"), col("value"), col("is_current"))
    }),

    // field.set with a template value referencing the record — typed
    // fast path (150k rows; the template compiles to struct reads).
    // The untyped dynamic-JSON machinery keeps its own gate coverage
    // via proc_filter / proc_field_convert / proc_json_* / proc_split.
    "proc_field_set" -> ((s, dir) => {
      val recs = Cdc.wrapTyped(t(s, dir, "orders"), "o_orderkey", "orders")
      val proc = Registry.create("field.set",
        Map("field" -> ".Payload.After.status_tag",
            "value" -> "{{ .Payload.After.o_orderstatus }}-X"))
      proc(recs)
        .select(col(s"${Cdc.PayloadAfter}.o_orderkey").as("o_orderkey"),
          col(s"${Cdc.PayloadAfter}.status_tag").as("status_tag"))
    }),

    // field.rename on the typed path: the old field is gone from the
    // struct SCHEMA (a plan-time fact), not merely nulled per row.
    "proc_field_rename" -> ((s, dir) => {
      val recs = Cdc.wrapTyped(t(s, dir, "orders"), "o_orderkey", "orders")
      val proc = Registry.create("field.rename",
        Map("mapping" -> ".Payload.After.o_totalprice:price"))
      val out = proc(recs)
      val paFields = out.schema(Cdc.PayloadAfter).dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
      assert(!paFields.contains("o_totalprice"), "rename must drop the old field")
      out.select(col(s"${Cdc.PayloadAfter}.o_orderkey").as("o_orderkey"),
        col(s"${Cdc.PayloadAfter}.price").cast("double").as("price"),
        lit(null).cast("string").as("gone"))
    }),

    // field.exclude on the typed path: the dropped fields are gone from
    // the struct SCHEMA (a plan-time fact, like proc_field_rename) and
    // the 200k-row payload never round-trips through Jackson. The
    // untyped dynamic-JSON exclude keeps gate coverage via
    // proc_untyped_json below.
    "proc_field_exclude" -> ((s, dir) => {
      val recs = Cdc.wrapTyped(t(s, dir, "part"), "p_partkey", "part")
      val proc = Registry.create("field.exclude",
        Map("fields" -> ".Payload.After.p_retailprice,.Payload.After.p_brand"))
      val out = proc(recs)
      val paFields = out.schema(Cdc.PayloadAfter).dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
      out.select(col(s"${Cdc.PayloadAfter}.p_partkey").as("p_partkey"),
        col(s"${Cdc.PayloadAfter}.p_type").as("p_type"),
        lit(!paFields.contains("p_retailprice")).as("price_dropped"),
        lit(!paFields.contains("p_brand")).as("brand_dropped"))
    }),

    // field.convert int→string on the typed path: a plain codegen'd
    // try_cast on a native struct field (the Go-format string rules and
    // the Jackson path keep coverage via proc_untyped_json).
    "proc_field_convert" -> ((s, dir) => {
      val recs = Cdc.wrapTyped(t(s, dir, "part"), "p_partkey", "part")
      val proc = Registry.create("field.convert",
        Map("field" -> ".Payload.After.p_size", "type" -> "string"))
      proc(recs)
        .select(col(s"${Cdc.PayloadAfter}.p_partkey").as("p_partkey"),
          col(s"${Cdc.PayloadAfter}.p_size").as("p_size_str"))
    }),

    // Dedicated untyped-path gate: dynamic-JSON payload (Cdc.wrap) with
    // exclude + convert chained, projected back out via get_json_object
    // — keeps the Jackson machinery oracle-checked end to end without
    // carrying it over a 200k-row table (nation: 25 rows).
    "proc_untyped_json" -> ((s, dir) => {
      val recs = Cdc.wrap(t(s, dir, "nation"), "n_nationkey", "nation")
      val excl = Registry.create("field.exclude",
        Map("fields" -> ".Payload.After.n_comment"))
      val conv = Registry.create("field.convert",
        Map("field" -> ".Payload.After.n_regionkey", "type" -> "string"))
      conv(excl(recs))
        .select(get_json_object(col(Cdc.Key), "$.n_nationkey").cast("int").as("n_nationkey"),
          pget("n_name").as("n_name"),
          pget("n_regionkey").as("n_regionkey_str"),
          pget("n_comment").isNull.as("comment_dropped"))
    }),

    // json.decode of an embedded JSON string field (events.props).
    "proc_json_decode" -> ((s, dir) => {
      val recs = Cdc.wrap(t(s, dir, "events"), "event_id", "events")
      val proc = Registry.create("json.decode", Map("field" -> ".Payload.After.props"))
      proc(recs)
        .select(get_json_object(col(Cdc.Key), "$.event_id").cast("long").as("event_id"),
          get_json_object(col(Cdc.PayloadAfter), "$.props.k").cast("int").as("k"))
    }),

    // json.encode: structured sub-field re-serialized to a JSON string.
    "proc_json_encode" -> ((s, dir) => {
      val recs = Cdc.wrap(t(s, dir, "events"), "event_id", "events")
      val decode = Registry.create("json.decode", Map("field" -> ".Payload.After.props"))
      val encode = Registry.create("json.encode", Map("field" -> ".Payload.After.props"))
      encode(decode(recs))
        .select(get_json_object(col(Cdc.Key), "$.event_id").cast("long").as("event_id"),
          pget("props").as("props_json"))
    }),

    // base64 round-trip + one-way encode.
    "proc_base64" -> ((s, dir) => {
      val recs = Cdc.wrap(t(s, dir, "supplier"), "s_suppkey", "supplier")
      val enc = Registry.create("base64.encode", Map("field" -> ".Payload.After.s_name"))
      val dec = Registry.create("base64.decode", Map("field" -> ".Payload.After.s_name"))
      val encoded = enc(recs).withColumn("_b64", pget("s_name"))
      dec(encoded)
        .select(get_json_object(col(Cdc.Key), "$.s_suppkey").cast("long").as("s_suppkey"),
          pget("s_name").as("s_name_roundtrip"),
          col("_b64").as("s_name_b64"))
    }),

    // filter + condition: records matching the condition are dropped
    // (reference semantics: the condition selects what `filter` eats).
    "proc_filter" -> ((s, dir) => {
      val recs = Cdc.wrap(t(s, dir, "orders"), "o_orderkey", "orders")
      val proc = Registry.create("filter", Map.empty)
      proc(recs, condition = Some("""{{ eq .Payload.After.o_orderstatus "F" }}"""))
        .select(get_json_object(col(Cdc.Key), "$.o_orderkey").cast("long").as("o_orderkey"),
          pget("o_orderstatus").as("o_orderstatus"))
    }),

    // error + condition → DLQ channel: failed records carry _error.
    // Typed fast path: the 600k-row lineitem payload rides as a native
    // struct, so the condition and the DLQ projection are struct field
    // reads — zero Jackson in the plan (the untyped Cdc.wrap version
    // paid a full to_json + get_json_object per row: 3.6 s vs <1 s).
    "proc_error_dlq" -> ((s, dir) => {
      val recs = Cdc.wrapTyped(t(s, dir, "lineitem"), "l_orderkey", "lineitem")
      val proc = Registry.create("error", Map("message" -> "high discount"))
      val out = proc(recs,
        condition = Some("cast(.Payload.After.l_discount as double) > 0.09"))
      Cdc.failed(out)
        .select(col(s"${Cdc.PayloadAfter}.l_orderkey").cast("long").as("l_orderkey"),
          col(s"${Cdc.PayloadAfter}.l_linenumber").cast("int").as("l_linenumber"),
          col(Cdc.Error).as("error_msg"))
    }),

    // clone: 1 → count+1 copies with clone.index metadata.
    "proc_clone" -> ((s, dir) => {
      val recs = Cdc.wrap(t(s, dir, "region"), "r_regionkey", "region")
      val proc = Registry.create("clone", Map("count" -> "2"))
      proc(recs)
        .select(get_json_object(col(Cdc.Key), "$.r_regionkey").cast("int").as("r_regionkey"),
          col(Cdc.Metadata).getItem("clone.index").cast("int").as("clone_index"))
    }),

    // split: array field → one record per element with split.index.
    "proc_split" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val recs = part.select(
        lit(null).cast("binary").as(Cdc.Position),
        lit("create").as(Cdc.Operation),
        map(lit("opencdc.collection"), lit("part")).as(Cdc.Metadata),
        lit(null).cast("binary").as(Cdc.KeyRaw),
        to_json(struct(col("p_partkey"))).as(Cdc.Key),
        lit(null).cast("string").as(Cdc.PayloadBefore),
        to_json(struct(col("p_partkey"), split(col("p_name"), " ").as("words")))
          .as(Cdc.PayloadAfter))
      val proc = Registry.create("split", Map("field" -> ".Payload.After.words"))
      proc(recs)
        .select(get_json_object(col(Cdc.Key), "$.p_partkey").cast("long").as("p_partkey"),
          col(Cdc.Metadata).getItem("split.index").cast("int").as("split_index"),
          get_json_object(col(Cdc.PayloadAfter), "$.words").as("word"))
    }),

    // unwrap.debezium over a constructed Debezium envelope.
    "proc_unwrap_debezium" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val envelope = to_json(struct(
        struct(
          struct(col("o_orderkey"), col("o_totalprice")).as("after"),
          lit(null).cast("string").as("before"),
          lit("u").as("op"),
          struct(lit("pg").as("connector"), lit("public").as("schema")).as("source"),
          lit(1674061777225L).as("ts_ms")).as("payload")))
      val recs = o.select(
        lit(null).cast("binary").as(Cdc.Position),
        lit("create").as(Cdc.Operation),
        map(lit("existing"), lit("meta")).as(Cdc.Metadata),
        lit(null).cast("binary").as(Cdc.KeyRaw),
        to_json(struct(struct(col("o_orderkey")).as("payload"))).as(Cdc.Key),
        lit(null).cast("string").as(Cdc.PayloadBefore),
        envelope.as(Cdc.PayloadAfter))
      val proc = Registry.create("unwrap.debezium", Map.empty)
      proc(recs)
        .select(
          get_json_object(col(Cdc.PayloadAfter), "$.o_orderkey").cast("long").as("o_orderkey"),
          get_json_object(col(Cdc.PayloadAfter), "$.o_totalprice").cast("double").as("o_totalprice"),
          col(Cdc.Operation).as("operation"),
          col(Cdc.Metadata).getItem("connector").as("src_connector"),
          col(Cdc.Metadata).getItem("opencdc.readAt").as("read_at"),
          get_json_object(col(Cdc.Key), "$.o_orderkey").cast("long").as("key_orderkey"))
    }),

    // unwrap.kafkaconnect over a constructed KC envelope.
    "proc_unwrap_kafkaconnect" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val recs = c.select(
        lit(null).cast("binary").as(Cdc.Position),
        lit("create").as(Cdc.Operation),
        map().cast("map<string,string>").as(Cdc.Metadata),
        lit(null).cast("binary").as(Cdc.KeyRaw),
        to_json(struct(struct(col("c_custkey")).as("payload"),
          struct(lit("int64").as("type")).as("schema"))).as(Cdc.Key),
        lit(null).cast("string").as(Cdc.PayloadBefore),
        to_json(struct(
          struct(col("c_custkey"), col("c_name"), col("c_mktsegment")).as("payload"),
          struct(lit("struct").as("type")).as("schema"))).as(Cdc.PayloadAfter))
      val proc = Registry.create("unwrap.kafkaconnect", Map.empty)
      proc(recs)
        .select(
          get_json_object(col(Cdc.PayloadAfter), "$.c_custkey").cast("long").as("c_custkey"),
          get_json_object(col(Cdc.PayloadAfter), "$.c_mktsegment").as("c_mktsegment"),
          get_json_object(col(Cdc.Key), "$.c_custkey").cast("long").as("key_custkey"))
    }),

    // unwrap.opencdc over a nested OpenCDC record.
    "proc_unwrap_opencdc" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val inner = struct(
        base64(lit("inner-pos").cast("binary")).as("position"),
        lit("update").as("operation"),
        map(lit("inner"), lit("yes")).as("metadata"),
        struct(col("n_nationkey")).as("key"),
        struct(lit(null).cast("string").as("before"),
          struct(col("n_nationkey"), col("n_name")).as("after")).as("payload"))
      val recs = n.select(
        lit(null).cast("binary").as(Cdc.Position),
        lit("create").as(Cdc.Operation),
        map(lit("outer"), lit("yes")).as(Cdc.Metadata),
        lit(null).cast("binary").as(Cdc.KeyRaw),
        lit("outer-key").as(Cdc.Key),
        lit(null).cast("string").as(Cdc.PayloadBefore),
        to_json(inner).as(Cdc.PayloadAfter))
      val proc = Registry.create("unwrap.opencdc", Map.empty)
      proc(recs)
        .select(
          get_json_object(col(Cdc.PayloadAfter), "$.n_nationkey").cast("int").as("n_nationkey"),
          get_json_object(col(Cdc.PayloadAfter), "$.n_name").as("n_name"),
          col(Cdc.Operation).as("operation"),
          col(Cdc.Metadata).getItem("inner").as("meta_inner"),
          get_json_object(col(Cdc.Key), "$.n_nationkey").cast("int").as("key_nationkey"))
    }),

    // A full processor chain (decode → set → rename → convert → filter)
    // on the TYPED fast path: payload_after is a native struct, every
    // processor compiles to withField/dropFields/casts, and the whole
    // chain fuses into one codegen'd pass with ZERO per-record JSON
    // parsing (the same chain on Cdc.wrap pays ~5 Jackson passes/row).
    "proc_chain" -> ((s, dir) => {
      val recs = Cdc.wrapTyped(t(s, dir, "events"), "event_id", "events")
      val chain: DataFrame => DataFrame = df => {
        val p1 = Registry.create("json.decode",
          Map("field" -> ".Payload.After.props", "schema" -> "k INT"))
        val p2 = Registry.create("field.set",
          Map("field" -> ".Payload.After.flagged", "value" -> "{{ .Payload.After.event_type }}"))
        val p3 = Registry.create("field.rename",
          Map("mapping" -> ".Payload.After.value:amount"))
        val p4 = Registry.create("field.exclude", Map("fields" -> ".Payload.After.ts"))
        val p5 = Registry.create("filter", Map.empty)
        // filter eats what the condition selects: drop the "view" events
        p5(p4(p3(p2(p1(df)))), condition = Some("""{{ eq .Payload.After.event_type "view" }}"""))
      }
      val out = chain(recs)
      // ts_dropped is a plan-time fact in typed mode: the exclude
      // removed the field from the struct SCHEMA, not just the value
      val paFields = out.schema(Cdc.PayloadAfter).dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
      // key lives in the typed payload too — zero JSON in the plan
      out.select(col(s"${Cdc.PayloadAfter}.event_id").as("event_id"),
        col(s"${Cdc.PayloadAfter}.flagged").as("flagged"),
        col(s"${Cdc.PayloadAfter}.amount").cast("double").as("amount"),
        lit(!paFields.contains("ts")).as("ts_dropped"))
    }),

    // avro.encode → avro.decode round-trip (Confluent wire framing):
    // the decoded values must hash-match the source table, and the
    // intermediate slot must be framed binary, not JSON.
    "proc_avro_roundtrip" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val recs = sup.select(
        lit(null).cast("binary").as(Cdc.Position),
        lit("create").as(Cdc.Operation),
        map(lit("opencdc.collection"), lit("supplier")).as(Cdc.Metadata),
        lit(null).cast("binary").as(Cdc.KeyRaw),
        to_json(struct(col("s_suppkey"))).as(Cdc.Key),
        lit(null).cast("string").as(Cdc.PayloadBefore),
        to_json(struct(col("s_suppkey"), col("s_name"), col("s_acctbal")))
          .as(Cdc.PayloadAfter))
      val avroSchema =
        """{"type":"record","name":"supplier","fields":[
          |{"name":"s_suppkey","type":"long"},
          |{"name":"s_name","type":"string"},
          |{"name":"s_acctbal","type":"double"}]}""".stripMargin
      val enc = Registry.create("avro.encode",
        Map("field" -> ".Payload.After", "schema" -> avroSchema, "schema.id" -> "7"))
      val dec = Registry.create("avro.decode",
        Map("field" -> ".Payload.After", "schema" -> avroSchema))
      val wired = enc(recs).withColumn("_wire", col(Cdc.PayloadAfter))
      dec(wired).select(
        get_json_object(col(Cdc.Key), "$.s_suppkey").cast("long").as("s_suppkey"),
        pget("s_name").as("s_name"),
        pget("s_acctbal").cast("double").as("s_acctbal"),
        (substring(col("_wire"), 1, 1) === lit("\u0000")).as("wire_framed"))
    }),

    // sql processor: arbitrary Spark SQL over the records view (typed
    // payload — predicate on a native struct field).
    "proc_sql" -> ((s, dir) => {
      val recs = Cdc.wrapTyped(t(s, dir, "orders"), "o_orderkey", "orders")
      val proc = Registry.create("sql", Map(
        "view" -> "records",
        "query" -> "SELECT * FROM records WHERE payload_after.o_totalprice > 150000.0"))
      proc(recs).select(
        col(s"${Cdc.PayloadAfter}.o_orderkey").as("o_orderkey"),
        col(s"${Cdc.PayloadAfter}.o_totalprice").as("o_totalprice"))
    }),

    // dedup.exact processor form: first record (by key order) per
    // distinct content value survives within the batch.
    "proc_dedup_exact" -> ((s, dir) => {
      val recs = Cdc.wrap(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "documents")
      val proc = Registry.create("dedup.exact", Map("field" -> ".Payload.After.lang"))
      proc(recs).select(
        get_json_object(col(Cdc.Key), "$.doc_id").cast("long").as("doc_id"),
        pget("lang").as("lang"))
    }),

    // text.metrics processor: counts written back into the payload.
    "proc_text_metrics" -> ((s, dir) => {
      val recs = Cdc.wrap(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "documents")
      val proc = Registry.create("text.metrics", Map("field" -> ".Payload.After.text"))
      proc(recs).select(
        get_json_object(col(Cdc.Key), "$.doc_id").cast("long").as("doc_id"),
        get_json_object(col(Cdc.PayloadAfter), "$.text_metrics.n_chars")
          .cast("long").as("n_chars"),
        get_json_object(col(Cdc.PayloadAfter), "$.text_metrics.n_tokens")
          .cast("long").as("n_tokens"))
    }),

    // custom.javascript executed for REAL (per-partition Node
    // subprocess, the reference's process(record) contract) with a
    // deterministic script: one field added, one uppercased, one
    // metadata key, every tenth record filtered — the oracle replays
    // the same logic in SQL. ASCII corpus, so JS string length (UTF-16
    // units) and SQL length (codepoints) agree.
    "proc_custom_js" -> ((s, dir) => {
      val recs = Cdc.wrap(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
        "doc_id", "documents")
      val proc = Registry.create("custom.javascript", Map("script" ->
        """function process(r) {
          |  var p = r.Payload.After;
          |  if (p.doc_id % 10 == 7) return null;
          |  p.n_chars = String(p.text).length;
          |  p.shout_lang = String(p.lang).toUpperCase();
          |  r.Metadata["js"] = "1";
          |  return r;
          |}""".stripMargin))
      proc(recs).select(
        get_json_object(col(Cdc.PayloadAfter), "$.doc_id")
          .cast("long").as("doc_id"),
        get_json_object(col(Cdc.PayloadAfter), "$.n_chars")
          .cast("long").as("n_chars"),
        get_json_object(col(Cdc.PayloadAfter), "$.shout_lang").as("shout_lang"),
        col(Cdc.Metadata).getItem("js").as("js"))
    }),

    // custom.wasm executed for REAL (hand-assembled module — WAT in
    // WasmSpec — run by Node's WebAssembly in the per-partition
    // subprocess host): ASCII-uppercase over the raw key bytes; the
    // oracle replays it as upper() on this ASCII corpus.
    "proc_custom_wasm" -> ((s, dir) => {
      val recs = Cdc.wrap(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "documents")
        .withColumn(Cdc.Key,
          get_json_object(col(Cdc.PayloadAfter), "$.text"))
      val proc = Registry.create("custom.wasm", Map(
        "wasm.base64" -> WasmUpperModuleB64, "field" -> ".Key"))
      proc(recs).select(
        get_json_object(col(Cdc.PayloadAfter), "$.doc_id")
          .cast("long").as("doc_id"),
        col(Cdc.Key).as("shout_text"))
    })
  )

  /** The hand-assembled gate module (same bytes as WasmSpec, where
    * the WAT source is documented): alloc/process exports, ASCII
    * uppercase in place, -1 filter on empty, trap on leading '!'.
    */
  private val WasmUpperModuleB64: String =
    "AGFzbQEAAAABDAJgAX8Bf2ACf38BfgMDAgABBQMBAAEGBwF/AUGACAsHHAMGbWVtb3J5" +
    "AgAFYWxsb2MAAAdwcm9jZXNzAAEKeAIRAQF/IwAhASMAIABqJAAgAQtkAQJ/IAFFBEBC" +
    "fw8LIAAtAABBIUYEQAALQQAhAgJAA0AgAiABTg0BIAAgAmotAAAhAyADQeEATiADQfoA" +
    "THEEQCAAIAJqIANBIGs6AAALIAJBAWohAgwACwsgAK1CIIYgAa2ECw=="

  val oracles: Map[String, String] = Map(
    "proc_custom_js" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
           upper(lang) AS shout_lang, '1' AS js
         FROM documents WHERE doc_id % 10 <> 7""",
    "proc_custom_wasm" ->
      """SELECT doc_id, upper(text) AS shout_text FROM documents""",
    "cdc_materialize" ->
      """WITH l AS (SELECT user_id, event_id,
                epoch_ns(ts) // 1000000000 AS pos,
                CASE WHEN event_type = 'error' THEN 'delete'
                     ELSE 'update' END AS op, value
              FROM events),
         r AS (SELECT *, row_number() OVER
                (PARTITION BY user_id ORDER BY pos DESC, event_id DESC) AS rn
               FROM l)
         SELECT user_id, event_id, pos, value
         FROM r WHERE rn = 1 AND op <> 'delete'""",
    // full recompute over the ENTIRE log — zero shared machinery with
    // the snapshot + delta-maintenance path under test
    "cdc_incr_agg" ->
      """WITH l AS (SELECT user_id, event_id,
                epoch_ns(ts) // 1000000000 AS pos,
                CASE WHEN event_type = 'error' THEN 'delete'
                     ELSE 'update' END AS op, value
              FROM events),
         r AS (SELECT *, row_number() OVER
                (PARTITION BY user_id ORDER BY pos DESC, event_id DESC) AS rn
               FROM l),
         f AS (SELECT * FROM r WHERE rn = 1 AND op <> 'delete')
         SELECT CAST(floor(value / 100) AS BIGINT) AS bucket,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM f GROUP BY 1""",
    // independent formulation: lead() over the full log BEFORE the
    // delete filter, so tombstones close intervals exactly as the
    // operator's window does
    "cdc_scd2" ->
      """WITH l AS (SELECT user_id, event_id,
                epoch_ns(ts) // 1000000000 AS pos,
                CASE WHEN event_type = 'error' THEN 'delete'
                     ELSE 'update' END AS op, value
              FROM events),
         o AS (SELECT *, pos AS valid_from,
                lead(pos) OVER
                  (PARTITION BY user_id ORDER BY pos, event_id) AS valid_to
               FROM l)
         SELECT user_id, event_id, valid_from, valid_to, value,
           (valid_to IS NULL) AS is_current
         FROM o WHERE op <> 'delete'""",
    "proc_field_set" ->
      "SELECT o_orderkey, o_orderstatus || '-X' AS status_tag FROM orders",
    "proc_field_rename" ->
      "SELECT o_orderkey, o_totalprice AS price, CAST(NULL AS VARCHAR) AS gone FROM orders",
    "proc_field_exclude" ->
      """SELECT p_partkey, p_type, TRUE AS price_dropped, TRUE AS brand_dropped FROM part""",
    "proc_field_convert" ->
      "SELECT p_partkey, CAST(p_size AS VARCHAR) AS p_size_str FROM part",
    "proc_untyped_json" ->
      """SELECT n_nationkey, n_name, CAST(n_regionkey AS VARCHAR) AS n_regionkey_str,
         TRUE AS comment_dropped FROM nation""",
    "proc_json_decode" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events""",
    "proc_json_encode" ->
      """SELECT event_id, CAST(json_extract(props, '$') AS VARCHAR) AS props_json
         FROM events""",
    "proc_base64" ->
      """SELECT s_suppkey, s_name AS s_name_roundtrip,
         to_base64(encode(s_name)) AS s_name_b64 FROM supplier""",
    "proc_filter" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus <> 'F'""",
    "proc_error_dlq" ->
      """SELECT l_orderkey, l_linenumber, 'high discount' AS error_msg
         FROM lineitem WHERE l_discount > 0.09""",
    "proc_clone" ->
      """SELECT r_regionkey, clone_index FROM region
         CROSS JOIN (VALUES (0),(1),(2)) AS t(clone_index)""",
    "proc_split" ->
      """SELECT p_partkey,
         CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1 AS INT) AS split_index,
         unnest(string_split(p_name, ' ')) AS word
         FROM part""",
    "proc_unwrap_debezium" ->
      """SELECT o_orderkey, o_totalprice, 'update' AS operation,
         'pg' AS src_connector, '1674061777225000000' AS read_at,
         o_orderkey AS key_orderkey FROM orders""",
    "proc_unwrap_kafkaconnect" ->
      """SELECT c_custkey, c_mktsegment, c_custkey AS key_custkey FROM customer""",
    "proc_unwrap_opencdc" ->
      """SELECT n_nationkey, n_name, 'update' AS operation, 'yes' AS meta_inner,
         n_nationkey AS key_nationkey FROM nation""",
    "proc_chain" ->
      """SELECT event_id, event_type AS flagged, value AS amount, TRUE AS ts_dropped
         FROM events WHERE event_type <> 'view'""",
    "proc_avro_roundtrip" ->
      """SELECT s_suppkey, s_name, s_acctbal, TRUE AS wire_framed FROM supplier""",
    "proc_sql" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 150000.0""",
    // survivor = lexicographically-smallest serialized key (the CDC key
    // is the JSON '{"doc_id":N}' string, and dedup.exact orders by it)
    "proc_dedup_exact" ->
      """SELECT CAST(json_extract_string(min('{"doc_id":' || doc_id || '}'),
           '$.doc_id') AS BIGINT) AS doc_id, lang
         FROM documents GROUP BY lang""",
    "proc_text_metrics" ->
      """SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
         FROM documents"""
  )
}

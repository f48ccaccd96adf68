"""Python DataSource connector (batch + stream + filter pushdown)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from hrfco_data_pipeline_spark.plans.wire import synthetic_wire
from hrfco_data_pipeline_spark.sources.wire_datasource import register

SF = "/root/testdata/sf0.001"


def _stage(spark, tmp_path, name="src"):
    src = str(tmp_path / name)
    synthetic_wire(spark, SF).select("value").coalesce(3).write.mode(
        "overwrite"
    ).text(src)
    return src


def _py_parse(src):
    """Ground-truth parse of the staged files (the connector contract)."""
    import os

    rows = []
    for f in sorted(os.listdir(src)):
        if f.startswith(("_", ".")):
            continue
        for line in open(os.path.join(src, f), encoding="utf-8"):
            line = line.rstrip("\n")
            if not line.strip():
                continue
            try:
                d = json.loads(line)
                assert isinstance(d, dict)
                rows.append(
                    tuple(
                        v if isinstance(v, str) or v is None else str(v)
                        for v in (
                            d.get("wlobscd"),
                            d.get("ymdhm"),
                            d.get("wl"),
                            d.get("fw"),
                        )
                    )
                )
            except (ValueError, AssertionError):
                rows.append((None, None, None, None))
    return sorted(rows, key=repr)


def test_batch_read_matches_ground_truth(spark, tmp_path):
    src = _stage(spark, tmp_path)
    register(spark)
    got = sorted(
        (
            (r.wlobscd, r.ymdhm, r.wl, r.fw)
            for r in spark.read.format("hrfco_wire").load(src).collect()
        ),
        key=repr,
    )
    want = _py_parse(src)
    assert len(got) > 900  # sf0.001 stages ~1000 lines
    assert got == want


def test_filter_pushdown_equality(spark, tmp_path):
    src = _stage(spark, tmp_path)
    register(spark)
    truth = _py_parse(src)
    code = next(t[0] for t in truth if t[0] not in (None, ""))
    df = spark.read.format("hrfco_wire").load(src)
    pushed = df.filter(F.col("wlobscd") == code).select("wlobscd", "ymdhm")
    want = [t for t in truth if t[0] == code]
    got = pushed.collect()
    assert len(got) == len(want) > 0
    assert all(r.wlobscd == code for r in got)


def test_stream_read_availablenow(spark, tmp_path):
    src = _stage(spark, tmp_path)
    register(spark)
    q = (
        spark.readStream.format("hrfco_wire")
        .option("path", src)
        .load()
        .writeStream.format("memory")
        .queryName("wire_ds_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ds"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    n_stream = spark.sql("SELECT count(*) AS n FROM wire_ds_stream").collect()[0].n
    assert n_stream == len(_py_parse(src))


def test_stream_offsets_resume_across_restarts(spark, tmp_path):
    """Two availableNow runs over one checkpoint: the second run picks
    up exactly the files added after the first (offset continuation)."""
    import os

    src = str(tmp_path / "grow")
    os.makedirs(src)
    with open(os.path.join(src, "a.txt"), "w") as f:
        f.write('{"wlobscd":"1","ymdhm":"202401011200","wl":"1.0","fw":"2.0"}\n')
        f.write('{"wlobscd":"2","ymdhm":"202401011210","wl":"1.1","fw":"2.1"}\n')
    register(spark)

    out = str(tmp_path / "out_grow")

    def run_once():
        q = (
            spark.readStream.format("hrfco_wire")
            .option("path", src)
            .load()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck_grow"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        return sorted(r.wlobscd for r in spark.read.parquet(out).collect())

    assert run_once() == ["1", "2"]

    with open(os.path.join(src, "b.txt"), "w") as f:
        f.write('{"wlobscd":"3","ymdhm":"202401011220","wl":"1.2","fw":"2.2"}\n')
    # same checkpoint: only the new file is appended to the sink
    assert run_once() == ["1", "2", "3"]


def test_stream_mark_never_double_reads_out_of_order_names(spark, tmp_path):
    """A late file sorting BELOW the consumed mark is skipped, never
    replayed as a duplicate (the mark contract; positional offsets into
    a re-sorted listing would double-read)."""
    import os

    src = str(tmp_path / "ooo")
    os.makedirs(src)
    with open(os.path.join(src, "b_second.txt"), "w") as f:
        f.write('{"wlobscd":"1","ymdhm":"202401011200","wl":"1.0","fw":"2.0"}\n')
    register(spark)
    out = str(tmp_path / "out_ooo")

    def run_once():
        q = (
            spark.readStream.format("hrfco_wire")
            .option("path", src)
            .load()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck_ooo"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        return sorted(r.wlobscd for r in spark.read.parquet(out).collect())

    assert run_once() == ["1"]
    # arrives late with a name below the mark: out of contract -> skipped;
    # crucially nothing already consumed is emitted again
    with open(os.path.join(src, "a_first.txt"), "w") as f:
        f.write('{"wlobscd":"9","ymdhm":"202401011100","wl":"0.5","fw":"1.0"}\n')
    assert run_once() == ["1"]


def test_connector_stage_rejects_partial_foreign_stage(spark):
    """A partially written stage left by a killed foreign process (even
    with a stray _SUCCESS) must be detected via the manifest and rebuilt
    rather than silently under-counting."""
    import hashlib
    import os
    import shutil

    from hrfco_data_pipeline_spark.plans.wire import wire_connector_station_counts

    st = os.stat(os.path.join(SF, "events.parquet"))
    k = hashlib.md5(
        f"{os.path.realpath(SF)}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    stage = f"/tmp/hrfco_wire_stage_{k}"

    # ground truth from a clean stage
    shutil.rmtree(stage, ignore_errors=True)
    want = wire_connector_station_counts(spark, SF).collect()

    # simulate a foreign crash: truncate one part file, drop the
    # manifest's view of reality, leave a reassuring _SUCCESS behind
    parts = [f for f in os.listdir(stage) if not f.startswith(("_", "."))]
    victim = os.path.join(stage, sorted(parts)[0])
    with open(victim, "w", encoding="utf-8") as fh:
        fh.write('{"wlobscd":"X1"}\n')
    open(os.path.join(stage, "_SUCCESS"), "w").close()

    got = wire_connector_station_counts(spark, SF).collect()
    canon = lambda rows: sorted(((r[0] or "", *r[1:]) for r in rows))
    assert canon(got) == canon(want)


def test_wire_writer_roundtrip(spark, tmp_path):
    """The DataSource writer publishes via two-phase commit and the
    batch reader reads its own output back verbatim."""
    from hrfco_data_pipeline_spark.sources.wire_datasource import register

    register(spark)
    df = spark.createDataFrame(
        [
            ("1001", "202401151030", "3.25", "12.5", None),
            ("1002", "202401151040", None, "7.0", None),
        ],
        "wlobscd string, ymdhm string, wl string, fw string, value string",
    )
    out = str(tmp_path / "wire_out")
    df.write.format("hrfco_wire").option("path", out).mode("append").save()
    # no staging leftovers
    import os

    assert not [f for f in os.listdir(out) if f.startswith(".tmp-")]
    back = (
        spark.read.format("hrfco_wire")
        .option("path", out)
        .load()
        .select("wlobscd", "ymdhm", "wl", "fw")
    )
    got = {tuple(r) for r in back.collect()}
    assert got == {
        ("1001", "202401151030", "3.25", "12.5"),
        ("1002", "202401151040", None, "7.0"),
    }


def test_wire_writer_overwrite_replaces(spark, tmp_path):
    from hrfco_data_pipeline_spark.sources.wire_datasource import register

    register(spark)
    out = str(tmp_path / "wire_out")
    schema = "wlobscd string, ymdhm string, wl string, fw string, value string"
    spark.createDataFrame(
        [("1001", "202401151030", "1.0", None, None)], schema
    ).write.format("hrfco_wire").option("path", out).mode("append").save()
    spark.createDataFrame(
        [("2002", "202401151040", "2.0", None, None)], schema
    ).write.format("hrfco_wire").option("path", out).mode("overwrite").save()
    back = spark.read.format("hrfco_wire").option("path", out).load()
    assert [r.wlobscd for r in back.collect()] == ["2002"]

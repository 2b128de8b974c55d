"""ManifestCatalog: snapshot semantics (Iceberg-emulation, SURVEY.md §7.3 #5)."""

import pandas as pd

from dataquality_spark.catalog import ManifestCatalog


def test_snapshot_overwrite_and_time_travel(spark, tmp_path):
    cat = ManifestCatalog(str(tmp_path))
    df1 = spark.createDataFrame(pd.DataFrame({"x": [1, 2, 3]}))
    df2 = spark.createDataFrame(pd.DataFrame({"x": [10, 20]}))
    s1 = cat.write(df1, "t", summary={"rows": 3})
    s2 = cat.write(df2, "t", mode="overwrite")
    assert cat.read(spark, "t").count() == 2
    assert cat.read(spark, "t", snapshot_id=s1).count() == 3  # time travel
    snaps = cat.snapshots("t")
    assert [s["id"] for s in snaps] == [s1, s2]
    assert snaps[1]["parent"] == s1
    assert cat.has_metadata("t") and not cat.has_metadata("nope")


def test_snapshot_append(spark, tmp_path):
    cat = ManifestCatalog(str(tmp_path))
    df1 = spark.createDataFrame(pd.DataFrame({"x": [1, 2]}))
    df2 = spark.createDataFrame(pd.DataFrame({"x": [3]}))
    cat.write(df1, "t")
    cat.write(df2, "t", mode="append")
    assert sorted(r["x"] for r in cat.read(spark, "t").collect()) == [1, 2, 3]


def test_expire_snapshots_keeps_current_readable(spark, tmp_path):
    """Expiry must delete only unreachable data dirs: an append chain's
    current snapshot still reads ALL its rows afterwards, and expired
    snapshot ids are gone from the manifest."""
    cat = ManifestCatalog(str(tmp_path))
    cat.write(spark.createDataFrame(pd.DataFrame({"x": [1, 2]})), "t")
    s_old = cat.write(spark.createDataFrame(pd.DataFrame({"x": [9]})), "t",
                      mode="overwrite")   # orphaned by the next overwrite
    cat.write(spark.createDataFrame(pd.DataFrame({"x": [3, 4]})), "t",
              mode="overwrite")
    cat.write(spark.createDataFrame(pd.DataFrame({"x": [5]})), "t",
              mode="append")             # current: shares dirs with previous

    removed = cat.expire_snapshots("t", keep_last=2)
    assert removed                        # the first two snapshots' dirs
    snaps = cat.snapshots("t")
    assert len(snaps) == 2
    assert s_old not in [s["id"] for s in snaps]
    got = sorted(r["x"] for r in cat.read(spark, "t").collect())
    assert got == [3, 4, 5]              # shared append-chain dirs survive
    assert cat.expire_snapshots("t", keep_last=2) == []  # idempotent


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """A partitioned catalog write must let a partition filter prune at scan
    time (the Parquet-manifest stand-in for Iceberg partition pruning): the
    executed plan carries a PartitionFilters entry on `lang` and only the
    matching partition's rows are read."""
    cat = ManifestCatalog(str(tmp_path))
    df = spark.createDataFrame(pd.DataFrame({
        "url": [f"u{i}" for i in range(40)],
        "lang": ["en" if i % 4 else "de" for i in range(40)],
        "n": list(range(40)),
    }))
    cat.write(df, "pages_part", partition_by=["lang"])
    got = cat.read(spark, "pages_part").where("lang = 'de'")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert got.count() == 10


def test_expire_snapshots_rejects_keep_last_zero(spark, tmp_path):
    import pytest
    cat = ManifestCatalog(str(tmp_path))
    cat.write(spark.createDataFrame(pd.DataFrame({"x": [1]})), "t")
    with pytest.raises(ValueError, match="keep_last"):
        cat.expire_snapshots("t", keep_last=0)


def test_read_unknown_or_expired_snapshot_raises_clearly(spark, tmp_path):
    import pytest as _pytest
    from dataquality_spark.catalog import ManifestCatalog
    cat = ManifestCatalog(str(tmp_path))
    df = spark.range(3).toDF("x")
    cat.write(df, "t")
    sid0 = cat.snapshots("t")[0]["id"]
    cat.write(df.withColumn("x", df.x + 1), "t", mode="overwrite")
    with _pytest.raises(FileNotFoundError, match="no snapshot"):
        cat.read(spark, "t", snapshot_id="nope")
    cat.expire_snapshots("t", keep_last=1)
    with _pytest.raises(FileNotFoundError, match="unknown or expired"):
        cat.read(spark, "t", snapshot_id=sid0)


def test_expire_commits_manifest_before_deleting(spark, tmp_path, monkeypatch):
    """The Iceberg order: a crash during the file deletes must leave a
    manifest that references only surviving data (orphan files are fine,
    dangling manifests are not)."""
    import shutil as _shutil
    from dataquality_spark.catalog import ManifestCatalog
    cat = ManifestCatalog(str(tmp_path))
    df = spark.range(3).toDF("x")
    cat.write(df, "t")
    cat.write(df, "t", mode="overwrite")

    real_rmtree = _shutil.rmtree

    def boom(path, *a, **k):
        raise OSError("simulated crash mid-delete")

    monkeypatch.setattr(_shutil, "rmtree", boom)
    try:
        cat.expire_snapshots("t", keep_last=1)
    except OSError:
        pass
    monkeypatch.setattr(_shutil, "rmtree", real_rmtree)
    # manifest already pruned: every listed snapshot's data is readable
    for s in cat.snapshots("t"):
        assert cat.read(spark, "t", snapshot_id=s["id"]).count() == 3
    assert len(cat.snapshots("t")) == 1

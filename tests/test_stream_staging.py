"""Pins for the file-stream staging machinery (`_stream_dir`).

Two real bug classes, both found by round drives:

1. r10: the landing dir was keyed by the sf LABEL alone, so a
   scale-instrument scratch `sf0.1` aliased the driver's
   `/root/testdata/sf0.1` and every stream silently read the UNION
   (windowed aggregates exactly doubled).  The dir is now keyed by a
   digest of the absolute source path — pinned here with two
   same-basename sources and a full availableNow stream count.
2. r10 ADVICE: regenerating data IN PLACE at the same absolute path
   reused the old landing dir: symlinks to renamed/deleted part
   files survived (union of old+new, or a broken-link crash), and
   `os.path.exists` is False THROUGH a dead symlink so the re-link
   raised FileExistsError.  `_stream_dir` now prunes stale/broken
   links before re-linking — pinned with an in-place regeneration of
   a directory-parquet source.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.streaming.jobs import (
    _stream_dir,
    read_events_stream,
    run_to_table,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def twin_sources(spark, tmp_path_factory):
    """Two sources SHARING the basename sf0.1, different row counts:
    a/sf0.1/events.parquet (60 rows, single file) and
    b/sf0.1/events.parquet (25 rows, single file)."""
    root = tmp_path_factory.mktemp("staging")
    ev = load_table(spark, SF_DIR, "events")
    out = {}
    for label, n in (("a", 60), ("b", 25)):
        sf = root / label / "sf0.1"
        sf.mkdir(parents=True)
        scratch = str(root / f"_{label}_scratch")
        ev.orderBy("event_id").limit(n).coalesce(1).write.parquet(scratch)
        (part,) = glob.glob(os.path.join(scratch, "part-*.parquet"))
        shutil.copy(part, str(sf / "events.parquet"))
        out[label] = (str(sf), n)
    return out


def test_same_basename_sources_stage_into_distinct_dirs(twin_sources):
    da = _stream_dir(twin_sources["a"][0])
    db = _stream_dir(twin_sources["b"][0])
    assert da != db
    # idempotent re-stage of the same source: same dir, no raise
    assert _stream_dir(twin_sources["a"][0]) == da


def test_stream_reads_only_its_own_rows(spark, twin_sources):
    # stage BOTH first — the r10 bug needs the twin already present
    for label in ("a", "b"):
        _stream_dir(twin_sources[label][0])
    for label, qname in (("a", "staging_a"), ("b", "staging_b")):
        sf, n = twin_sources[label]
        s = read_events_stream(spark, sf)
        got = run_to_table(
            spark, s.groupBy().count(), qname, "complete"
        ).collect()[0][0]
        assert got == n, f"{label}: stream read {got} rows, own={n}"


def test_in_place_regeneration_prunes_stale_links(spark, tmp_path):
    # directory-parquet source (the gen_scale_data.py layout)
    sf = tmp_path / "sf0.1"
    src = sf / "events.parquet"
    src.mkdir(parents=True)
    ev = load_table(spark, SF_DIR, "events").orderBy("event_id")
    scratch = str(tmp_path / "scratch1")
    ev.limit(40).coalesce(1).write.parquet(scratch)
    (part,) = glob.glob(os.path.join(scratch, "part-*.parquet"))
    shutil.copy(part, str(src / "gen-one.parquet"))
    d = _stream_dir(str(sf))
    assert sorted(os.listdir(d)) == ["gen-one.parquet"]

    # regenerate IN PLACE at the same absolute path: old part file
    # deleted, new one under a different name
    os.remove(str(src / "gen-one.parquet"))
    scratch2 = str(tmp_path / "scratch2")
    ev.limit(15).coalesce(1).write.parquet(scratch2)
    (part2,) = glob.glob(os.path.join(scratch2, "part-*.parquet"))
    shutil.copy(part2, str(src / "gen-two.parquet"))

    d2 = _stream_dir(str(sf))  # must not raise FileExistsError
    assert d2 == d
    assert sorted(os.listdir(d)) == ["gen-two.parquet"]
    # no broken links, and a batch read sees only the new generation
    for f in os.listdir(d):
        assert os.path.exists(os.path.join(d, f))
    assert spark.read.parquet(d).count() == 15


def test_single_file_source_replaced_in_place(spark, tmp_path):
    sf = tmp_path / "sf0.1"
    sf.mkdir(parents=True)
    ev = load_table(spark, SF_DIR, "events").orderBy("event_id")
    for n, scratch in ((30, "s1"), (12, "s2")):
        out = str(tmp_path / scratch)
        ev.limit(n).coalesce(1).write.parquet(out)
        (part,) = glob.glob(os.path.join(out, "part-*.parquet"))
        target = str(sf / "events.parquet")
        if os.path.exists(target):
            os.remove(target)
        shutil.copy(part, target)
        d = _stream_dir(str(sf))
        assert spark.read.parquet(d).count() == n


def test_stray_non_target_directory_entry_is_tolerated(spark, tmp_path):
    """An un-removable entry whose name does NOT collide with a
    current target (a hand-made subdirectory in the landing dir) must
    not kill staging — the stream never reads it, so skipping is
    safe (ADVICE r11, narrowed r12)."""
    sf = tmp_path / "sf0.1"
    sf.mkdir(parents=True)
    ev = load_table(spark, SF_DIR, "events").orderBy("event_id").limit(10)
    scratch = str(tmp_path / "s")
    ev.coalesce(1).write.parquet(scratch)
    (part,) = glob.glob(os.path.join(scratch, "part-*.parquet"))
    shutil.copy(part, str(sf / "events.parquet"))
    d = _stream_dir(str(sf))
    os.makedirs(os.path.join(d, "stray_dir"), exist_ok=True)
    d2 = _stream_dir(str(sf))  # must not raise
    assert d2 == d
    assert spark.read.parquet(d2).count() == 10


def test_target_shadowing_directory_entry_fails_loudly(spark, tmp_path):
    """ADVICE r12: an un-removable entry that SHADOWS a current
    target name would be silently read in place of the real data
    (the r10 unions-old+new failure mode, silent) — staging must
    raise instead of returning a landing dir with wrong input."""
    sf = tmp_path / "sf0.1"
    sf.mkdir(parents=True)
    ev = load_table(spark, SF_DIR, "events").orderBy("event_id").limit(10)
    scratch = str(tmp_path / "s")
    ev.coalesce(1).write.parquet(scratch)
    (part,) = glob.glob(os.path.join(scratch, "part-*.parquet"))
    shutil.copy(part, str(sf / "events.parquet"))
    d = _stream_dir(str(sf))
    # replace the staged symlink with a DIRECTORY of the same name
    os.remove(os.path.join(d, "events.parquet"))
    os.makedirs(os.path.join(d, "events.parquet", "junk"))
    with pytest.raises(OSError, match="shadows current target"):
        _stream_dir(str(sf))
    # clean up so later staging of this tmp dir isn't poisoned
    shutil.rmtree(os.path.join(d, "events.parquet"))

"""Compaction: fewer, range-clustered files; data preserved byte-for-byte.

The scan-pruning payoff is asserted structurally: after compacting on
o_orderkey, per-file [min,max] key ranges must be pairwise disjoint (so a
point/range predicate can skip every other file), which hash-sprayed
small files never are.
"""

import glob

import pyspark.sql.functions as F

from cartodb_importer_spark.sinks import maintenance as M

SF = "/root/testdata/sf0.001"


def _parquet_files(path):
    return sorted(glob.glob(f"{path}/*.parquet"))


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "small_files")
    out = str(tmp_path / "compacted")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    # simulate micro-batch accretion: 40 hash-sprayed small files
    orders.repartition(40).write.mode("overwrite").parquet(src)
    assert len(_parquet_files(src)) == 40

    df = spark.read.parquet(src)
    n = M.compact(df, out, cluster_by=["o_orderkey"])
    files = _parquet_files(out)
    assert len(files) < 40 and len(files) == n

    a = spark.read.parquet(out)
    assert a.count() == orders.count()
    assert (
        a.agg(F.sum("o_orderkey")).collect()[0][0]
        == orders.agg(F.sum("o_orderkey")).collect()[0][0]
    )


def test_compacted_key_ranges_disjoint(spark, tmp_path):
    src = str(tmp_path / "small_files")
    out = str(tmp_path / "compacted")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orders.repartition(40).write.mode("overwrite").parquet(src)
    M.compact(
        spark.read.parquet(src),
        out,
        cluster_by=["o_orderkey"],
        target_file_bytes=16 * 1024,  # force several output files
    )
    stats = (
        M.file_stats(spark, out)
        .select("min_o_orderkey", "max_o_orderkey")
        .collect()
    )
    assert len(stats) >= 3
    spans = sorted((r[0], r[1]) for r in stats)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file key ranges overlap; pruning defeated"

    # the hash-sprayed source, by contrast, has every file spanning the
    # whole key domain (sanity check that the assertion is meaningful)
    src_stats = (
        M.file_stats(spark, src)
        .select("min_o_orderkey", "max_o_orderkey")
        .collect()
    )
    src_spans = sorted((r[0], r[1]) for r in src_stats)
    overlaps = sum(
        1
        for (l1, h1), (l2, h2) in zip(src_spans, src_spans[1:])
        if h1 > l2
    )
    assert overlaps > 0


def _batch_dirs(table_path):
    return sorted(
        d for d in glob.glob(f"{table_path}/__batch_id=*")
    )


def _canon_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_compact_batches_bounds_landing_zone(spark, tmp_path):
    """VERDICT r09 item 2: folding committed batch dirs into _base must
    (a) keep replay of the last batch idempotent, (b) leave read results
    identical, (c) drop the dir count to O(1) + recent."""
    from cartodb_importer_spark.sinks.catalog import LocalCatalog

    cat = LocalCatalog(str(tmp_path / "wh"))
    orders = spark.read.parquet(f"{SF}/orders.parquet").limit(600)
    slices = [
        orders.filter(F.col("o_orderkey") % 6 == i) for i in range(6)
    ]
    for i, s in enumerate(slices):
        cat.replace_batch(s, "landed", i)
    table_path = cat._path("landed")
    assert len(_batch_dirs(table_path)) == 6
    before = _canon_rows(cat.read(spark, "landed"))

    # fold ids < 5 (5 = the committed high-water mark: the only batch the
    # stream could still replay)
    n = M.compact_batches(spark, cat, "landed", keep_after_batch_id=5)
    assert n == 5
    assert _batch_dirs(table_path) == [f"{table_path}/__batch_id=5"]
    # (b) identical reads, __batch_id column included
    assert _canon_rows(cat.read(spark, "landed")) == before

    # (a) replay of the kept batch (different rows — a fixed retry)
    cat.replace_batch(slices[5].limit(10), "landed", 5)
    after_replay = cat.read(spark, "landed")
    assert (
        after_replay.filter("__batch_id = 5").count() == 10
    )
    assert after_replay.filter("__batch_id < 5").count() == sum(
        s.count() for s in slices[:5]
    )

    # idempotent no-op: nothing new below the mark
    assert M.compact_batches(spark, cat, "landed", keep_after_batch_id=5) == 0

    # incremental compaction: new batches land, mark advances
    for i in range(6, 9):
        cat.replace_batch(slices[i % 6].limit(5), "landed", i)
    before2 = _canon_rows(cat.read(spark, "landed"))
    assert M.compact_batches(spark, cat, "landed", keep_after_batch_id=8) == 3
    assert _batch_dirs(table_path) == [f"{table_path}/__batch_id=8"]
    assert _canon_rows(cat.read(spark, "landed")) == before2


def test_compact_batches_crash_leftovers_invisible(spark, tmp_path):
    """A crash after the _base swap but before old batch dirs are removed
    must not duplicate rows: read filters ids <= the marker, and the next
    compaction sweeps the stale dirs."""
    import shutil as _sh

    from cartodb_importer_spark.sinks.catalog import LocalCatalog

    cat = LocalCatalog(str(tmp_path / "wh"))
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    for i in range(4):
        cat.replace_batch(nation.filter(F.col("n_nationkey") % 4 == i), "t", i)
    before = _canon_rows(cat.read(spark, "t"))
    table_path = cat._path("t")
    # simulate the crash window: snapshot a batch dir, compact, restore it
    _sh.copytree(f"{table_path}/__batch_id=1", str(tmp_path / "saved"))
    M.compact_batches(spark, cat, "t", keep_after_batch_id=3)
    _sh.copytree(str(tmp_path / "saved"), f"{table_path}/__batch_id=1")
    assert _canon_rows(cat.read(spark, "t")) == before  # no duplicates
    # next compaction sweeps the stale dir even with nothing new to fold
    assert M.compact_batches(spark, cat, "t", keep_after_batch_id=3) == 0
    assert _batch_dirs(table_path) == [f"{table_path}/__batch_id=3"]


def test_committed_high_water_mark_from_real_checkpoint(spark, tmp_path):
    """End-to-end: a real file-source stream's checkpoint yields the mark,
    and compacting below it preserves reads across a stream RESTART (the
    replay path Structured Streaming actually exercises)."""
    from cartodb_importer_spark.queries import read_parquet_normalized
    from cartodb_importer_spark.sinks.catalog import LocalCatalog
    from cartodb_importer_spark.streaming import streams as S
    from cartodb_importer_spark.streaming.sinks import stream_to_catalog

    src_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    cat = LocalCatalog(str(tmp_path / "wh"))
    events = read_parquet_normalized(
        spark, "/root/testdata/sf0.001/events.parquet"
    )
    assert M.committed_high_water_mark(ckpt) == -1  # no checkpoint yet

    events.filter("event_id < 500").coalesce(1).write.parquet(src_dir)
    q = stream_to_catalog(S.read_events_stream(spark, src_dir), cat, "ev", ckpt)
    q.awaitTermination()
    hwm = M.committed_high_water_mark(ckpt)
    assert hwm >= 0
    M.compact_batches(spark, cat, "ev", keep_after_batch_id=hwm)

    # restart from the same checkpoint with new data: only the new file
    # is processed, and the compacted base plus new batches read cleanly
    events.filter("event_id >= 500").coalesce(1).write.mode("append").parquet(src_dir)
    q2 = stream_to_catalog(S.read_events_stream(spark, src_dir), cat, "ev", ckpt)
    q2.awaitTermination()
    landed = cat.read(spark, "ev")
    assert landed.count() == events.count()
    assert landed.select("event_id").distinct().count() == events.count()
    assert M.committed_high_water_mark(ckpt) > hwm


def test_version_snapshot_of_compacted_table_reads_base(spark, tmp_path):
    """A VersionedLocalCatalog snapshot of a compacted streaming table
    carries its _base dir; read_version must include those rows (a bare
    parquet read of the version dir would silently skip the hidden dir)."""
    from cartodb_importer_spark.sinks.catalog import VersionedLocalCatalog

    cat = VersionedLocalCatalog(str(tmp_path / "wh"), keep_versions=2)
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    for i in range(3):
        cat.replace_batch(nation.filter(F.col("n_nationkey") % 3 == i), "t", i)
    M.compact_batches(spark, cat, "t", keep_after_batch_id=2)
    before = _canon_rows(cat.read(spark, "t"))
    # version-publish a replacement; the old (compacted) table becomes v1
    cat.publish_version(
        spark.createDataFrame([(0, "x")], "id long, v string"), "t"
    )
    assert _canon_rows(cat.read_version(spark, "t", 1)) == before


def test_stream_to_catalog_inband_compaction(spark, tmp_path):
    """compact_every=N folds committed batch dirs during the stream
    itself: after draining many single-file micro-batches the landing
    zone must hold the compacted base plus only recent batch dirs, with
    exactly-once data — including across a checkpoint restart."""
    import time

    from cartodb_importer_spark.queries import read_parquet_normalized
    from cartodb_importer_spark.sinks.catalog import LocalCatalog
    from cartodb_importer_spark.streaming import streams as S
    from cartodb_importer_spark.streaming.sinks import stream_to_catalog

    src_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    cat = LocalCatalog(str(tmp_path / "wh"))
    events = read_parquet_normalized(
        spark, "/root/testdata/sf0.001/events.parquet"
    )
    import os

    os.makedirs(src_dir, exist_ok=True)
    lo, hi = 0, 1000
    step = (hi - lo) // 5
    for i in range(5):  # 5 files -> 5 micro-batches (maxFilesPerTrigger=1)
        chunk = events.filter(
            (F.col("event_id") >= lo + i * step)
            & (F.col("event_id") < (hi if i == 4 else lo + (i + 1) * step))
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{i}")
        )
        part = glob.glob(str(tmp_path / f"stage{i}") + "/part-*.parquet")[0]
        import shutil as _sh

        _sh.copy(part, f"{src_dir}/f{i}.parquet")
        os.utime(f"{src_dir}/f{i}.parquet", (1700000000 + i, 1700000000 + i))
    expected = events.filter(F.col("event_id") < hi).count()

    q = stream_to_catalog(
        S.read_events_stream(spark, src_dir), cat, "ev", ckpt,
        compact_every=2,
    )
    q.awaitTermination()
    table_path = cat._path("ev")
    assert os.path.isdir(os.path.join(table_path, "_base"))  # compacted
    live = _batch_dirs(table_path)
    assert len(live) <= 3  # base + only the recent tail of 5 batches
    assert cat.read(spark, "ev").count() == expected

    # restart from the checkpoint with one more file: exactly-once holds
    more = events.filter(F.col("event_id") >= hi)
    more.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage5"))
    part = glob.glob(str(tmp_path / "stage5") + "/part-*.parquet")[0]
    import shutil as _sh

    _sh.copy(part, f"{src_dir}/f5.parquet")
    q2 = stream_to_catalog(
        S.read_events_stream(spark, src_dir), cat, "ev", ckpt,
        compact_every=2,
    )
    q2.awaitTermination()
    got = cat.read(spark, "ev")
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_compact_batches_refuses_non_local_catalog(spark):
    """compact_batches depends on the LocalCatalog partition-dir layout;
    any other catalog must be refused loudly, not silently no-op."""
    import pytest

    from cartodb_importer_spark.sinks.catalog import Catalog

    with pytest.raises(ValueError, match="LocalCatalog"):
        M.compact_batches(spark, Catalog(), "t", keep_after_batch_id=5)


# --------------------------------------------------------------- properties
# compact_batches is new r10 code on the exactly-once read path; the
# example tests lock instances, this locks the invariant: for ANY
# sequence of batch writes, replays, and compaction points, the table
# must read exactly as if no compaction ever happened.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst


@given(
    ops=hst.lists(
        hst.one_of(
            # (write, batch_id, payload-salt): replays reuse an id
            hst.tuples(hst.just("write"), hst.integers(0, 6), hst.integers(0, 9)),
            # compact at the current committed frontier minus a margin
            hst.tuples(hst.just("compact"), hst.integers(0, 6), hst.just(0)),
        ),
        min_size=3,
        max_size=10,
    ),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_compact_batches_any_schedule_reads_like_uncompacted(spark, ops):
    import shutil
    import tempfile

    from cartodb_importer_spark.sinks.catalog import LocalCatalog

    root = tempfile.mkdtemp(prefix="prop_compact_")
    try:
        cat = LocalCatalog(f"{root}/wh")
        plain = LocalCatalog(f"{root}/wh_plain")  # never compacted
        live: dict[int, int] = {}  # batch_id -> payload salt (last write wins)
        frontier = -1  # highest compacted id so far
        for kind, bid, salt in ops:
            if kind == "write":
                df = spark.createDataFrame(
                    [(bid * 100 + i, salt) for i in range(3)],
                    "id long, salt long",
                )
                if bid <= frontier:
                    # contract violation (a committed batch never replays):
                    # must be REFUSED loudly, never silently dropped —
                    # this schedule found the original silent-drop bug
                    import pytest

                    with pytest.raises(ValueError, match="already compacted"):
                        cat.replace_batch(df, "t", bid)
                    continue
                cat.replace_batch(df, "t", bid)
                plain.replace_batch(df, "t", bid)
                live[bid] = salt
            elif live:  # compact below some written frontier
                folded = M.compact_batches(
                    spark, cat, "t", keep_after_batch_id=bid
                )
                if folded:
                    frontier = max(
                        i for i in live if i < bid
                    )
        if not live:
            return
        got = _canon_rows(cat.read(spark, "t"))
        want = _canon_rows(plain.read(spark, "t"))
        assert got == want
        # and the set of visible batch ids is exactly the live ones
        ids = {
            r["__batch_id"]
            for r in cat.read(spark, "t").select("__batch_id").collect()
        }
        assert ids == set(live)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ------------------------------------------------------- r11: crash + lock
# VERDICT r10 items 2+4 and ADVICE r10 (medium): the single-compactor
# assumption becomes an enforced advisory lock, and the crash window
# between compact_batches' two renames becomes a rehearsed, recoverable
# state instead of a documented footgun. The "kill" is injected as an
# exception at an exact filesystem point — byte-identical on-disk state
# to a SIGKILL there, except the in-process lock release, which the
# stale-takeover test covers by re-creating the orphaned lock file.

import os
import time

import pytest

from cartodb_importer_spark.sinks.catalog import LocalCatalog


class _SimulatedCrash(Exception):
    pass


def _hidden_dirs(table_path):
    return sorted(
        d for d in os.listdir(table_path)
        if d.startswith((".base_tmp_", ".base_old_", ".batch_tmp_", ".batch_old_"))
    )


def _seed_compacted_table(spark, tmp_path):
    """A table whose _base is the ONLY copy of batches 0-2 (their dirs
    were deleted by a first compaction), plus live batches 4-6 — the
    exact state where the pre-r11 crash window lost data. A never-
    compacted twin is the equality oracle."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    plain = LocalCatalog(str(tmp_path / "wh_plain"))
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    for i in range(4):
        b = nation.filter(F.col("n_nationkey") % 4 == i)
        cat.replace_batch(b, "kt", i)
        plain.replace_batch(b, "kt", i)
    assert M.compact_batches(spark, cat, "kt", keep_after_batch_id=3) == 3
    for i in range(4, 7):
        b = nation.filter(F.col("n_nationkey") % 3 == i % 3)
        cat.replace_batch(b, "kt", i)
        plain.replace_batch(b, "kt", i)
    return cat, plain


@pytest.mark.parametrize(
    "kill_point", ["before_swap", "mid_swap", "after_swap_before_sweep"]
)
def test_compact_batches_kill_and_resume(spark, tmp_path, kill_point, monkeypatch):
    """SIGKILL-equivalent faults at three points inside compact_batches:
    after the temp build (no rename ran), between the two renames (the
    ADVICE r10 data-loss window: no _base on disk), and after the swap
    before the sweep. Every read in the crashed state must be byte-equal
    to the never-compacted twin, and the next compact_batches — entering
    through a stale orphaned lock — must recover to a clean folded
    layout with equal values."""
    cat, plain = _seed_compacted_table(spark, tmp_path)
    want = _canon_rows(plain.read(spark, "kt"))
    table_path = cat._path("kt")
    assert _canon_rows(cat.read(spark, "kt")) == want

    if kill_point == "before_swap":
        def boom(src, dst):
            raise _SimulatedCrash("died before any rename")

        monkeypatch.setattr(M, "_rename", boom)
    elif kill_point == "mid_swap":
        real, calls = os.rename, {"n": 0}

        def boom(src, dst):
            calls["n"] += 1
            if calls["n"] == 2:  # after base->old, before tmp->base
                raise _SimulatedCrash("died between the two renames")
            real(src, dst)

        monkeypatch.setattr(M, "_rename", boom)
    else:
        class _CrashingShutil:
            @staticmethod
            def rmtree(p, ignore_errors=False):
                raise _SimulatedCrash("died before the sweep")

        monkeypatch.setattr(M, "shutil", _CrashingShutil)

    with pytest.raises(_SimulatedCrash):
        M.compact_batches(spark, cat, "kt", keep_after_batch_id=6)
    monkeypatch.undo()  # the "restarted process" sees plain os calls again

    if kill_point == "mid_swap":
        # the window under test really is the no-_base instant
        assert not os.path.isdir(os.path.join(table_path, "_base"))
        assert _hidden_dirs(table_path)  # data lives only in hidden dirs
    # (1) reads in the crashed state lose nothing
    assert _canon_rows(cat.read(spark, "kt")) == want
    # and the marker authority still refuses replays of folded batches
    assert cat.compacted_up_to("kt") >= 2

    # a real kill leaves the lock file behind; recreate it stale
    lockf = os.path.join(table_path, M.LOCK_FILE)
    with open(lockf, "w") as f:
        f.write("99999 0\n")
    os.utime(lockf, (time.time() - 7200, time.time() - 7200))

    # (2) the next compaction takes over the stale lock, recovers, folds
    M.compact_batches(spark, cat, "kt", keep_after_batch_id=6)
    assert _canon_rows(cat.read(spark, "kt")) == want
    assert _batch_dirs(table_path) == [f"{table_path}/__batch_id=6"]
    assert _hidden_dirs(table_path) == []
    assert not os.path.exists(lockf)
    # folded ids are refused on replay; the kept id still replays fine
    with pytest.raises(ValueError, match="already compacted"):
        cat.replace_batch(
            spark.createDataFrame([(1,)], "x long"), "kt", 4
        )
    cat.replace_batch(
        plain.read(spark, "kt").filter("__batch_id = 6").drop("__batch_id"),
        "kt",
        6,
    )
    assert _canon_rows(cat.read(spark, "kt")) == want


def test_mid_swap_crash_then_noop_compact_does_not_sweep_data(
    spark, tmp_path, monkeypatch
):
    """The exact ADVICE r10 scenario: crash between the renames, then a
    compaction with NOTHING new to fold. The pre-r11 code swept
    .base_tmp_*/.base_old_* — the only copies of folded batches — as
    'crashed leftovers'; now recovery renames the complete candidate in
    before any sweep."""
    cat, plain = _seed_compacted_table(spark, tmp_path)
    want = _canon_rows(plain.read(spark, "kt"))
    real, calls = os.rename, {"n": 0}

    def boom(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise _SimulatedCrash()
        real(src, dst)

    monkeypatch.setattr(M, "_rename", boom)
    with pytest.raises(_SimulatedCrash):
        M.compact_batches(spark, cat, "kt", keep_after_batch_id=6)
    monkeypatch.undo()
    table_path = cat._path("kt")
    # no-op run: marker after recovery is 5, nothing below 6 left to fold
    assert M.compact_batches(spark, cat, "kt", keep_after_batch_id=6) == 0
    assert os.path.isdir(os.path.join(table_path, "_base"))
    assert _hidden_dirs(table_path) == []
    assert _canon_rows(cat.read(spark, "kt")) == want


def test_concurrent_compactors_exactly_one_wins(spark, tmp_path, monkeypatch):
    """VERDICT r10 item 2: two compactors launched at a barrier — one
    folds, the other raises CompactionInProgress instead of racing the
    winner's temp-dir build/sweep."""
    import threading

    cat = LocalCatalog(str(tmp_path / "wh"))
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    for i in range(4):
        cat.replace_batch(nation.filter(F.col("n_nationkey") % 4 == i), "t", i)

    real_compact = M.compact

    def slow_compact(*a, **kw):  # hold the critical section long enough
        time.sleep(1.0)          # that the loser's O_EXCL attempt lands
        return real_compact(*a, **kw)

    monkeypatch.setattr(M, "compact", slow_compact)
    barrier = threading.Barrier(2)
    results: list = [None, None]

    def run(slot):
        barrier.wait()
        try:
            results[slot] = M.compact_batches(
                spark, cat, "t", keep_after_batch_id=3
            )
        except M.CompactionInProgress as e:
            results[slot] = e

    ts = [threading.Thread(target=run, args=(s,)) for s in (0, 1)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    winners = [r for r in results if isinstance(r, int)]
    losers = [r for r in results if isinstance(r, M.CompactionInProgress)]
    assert len(winners) == 1 and winners[0] == 3
    assert len(losers) == 1
    # lock released: a later compaction is a clean no-op
    assert M.compact_batches(spark, cat, "t", keep_after_batch_id=3) == 0


def test_fresh_lock_refused_stale_lock_taken_over(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    for i in range(3):
        cat.replace_batch(nation.filter(F.col("n_nationkey") % 3 == i), "t", i)
    lockf = os.path.join(cat._path("t"), M.LOCK_FILE)
    with open(lockf, "w") as f:
        f.write(f"{os.getpid()} {time.time()}\n")
    with pytest.raises(M.CompactionInProgress, match="another compactor"):
        M.compact_batches(spark, cat, "t", keep_after_batch_id=2)
    assert os.path.exists(lockf)  # the loser never unlinks a live lock
    os.utime(lockf, (time.time() - 7200, time.time() - 7200))
    assert M.compact_batches(spark, cat, "t", keep_after_batch_id=2) == 2
    assert not os.path.exists(lockf)


def test_stream_to_catalog_compact_every_fails_fast(spark, tmp_path):
    """ADVICE r10 (low): compact_every with a non-LocalCatalog catalog
    must be rejected at stream SETUP, not as a ValueError inside the Nth
    micro-batch killing a running query."""
    from cartodb_importer_spark.sinks.catalog import Catalog
    from cartodb_importer_spark.streaming.sinks import stream_to_catalog

    rate = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="LocalCatalog"):
        stream_to_catalog(
            rate, Catalog(), "t", str(tmp_path / "ck1"), compact_every=2
        )
    with pytest.raises(ValueError, match="compact_every"):
        stream_to_catalog(
            rate,
            LocalCatalog(str(tmp_path / "wh")),
            "t",
            str(tmp_path / "ck2"),
            compact_every=0,
        )


def test_markerless_tmp_candidates_are_ignored_and_swept(spark, tmp_path):
    """A compactor killed DURING the temp parquet write leaves a
    .base_tmp_* dir with no marker — incomplete by construction. It must
    never be served as a base (reads fall through correctly) and the
    next compaction sweeps it."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    for i in range(3):
        cat.replace_batch(nation.filter(F.col("n_nationkey") % 3 == i), "t", i)
    want = _canon_rows(cat.read(spark, "t"))
    junk = os.path.join(cat._path("t"), ".base_tmp_deadbeef")
    os.makedirs(junk)
    with open(os.path.join(junk, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00not parquet")  # truncated write, no marker
    # never-compacted table + markerless candidate: no effective base
    assert LocalCatalog._effective_base(cat._path("t")) is None
    assert _canon_rows(cat.read(spark, "t")) == want
    assert M.compact_batches(spark, cat, "t", keep_after_batch_id=2) == 2
    assert not os.path.isdir(junk)  # swept
    assert _canon_rows(cat.read(spark, "t")) == want

    # mid-swap state PLUS a markerless junk candidate: the marker-bearing
    # old base wins, the junk is never chosen
    base = os.path.join(cat._path("t"), "_base")
    aside = os.path.join(cat._path("t"), ".base_old_feedface")
    os.rename(base, aside)
    os.makedirs(junk)
    with open(os.path.join(junk, "garbage"), "wb") as f:
        f.write(b"\x00")
    assert LocalCatalog._effective_base(cat._path("t")) == aside
    assert _canon_rows(cat.read(spark, "t")) == want
    M.compact_batches(spark, cat, "t", keep_after_batch_id=2)  # recovers
    assert os.path.isdir(base) and not os.path.isdir(junk)
    assert _canon_rows(cat.read(spark, "t")) == want


def test_stream_survives_held_compaction_lock(spark, tmp_path):
    """A lock file left by a killed compactor (within its stale window)
    must NOT kill the stream: in-band compaction is skipped and retried
    later, data stays exactly-once, dirs simply accrete meanwhile."""
    import glob as _glob

    from cartodb_importer_spark.queries import read_parquet_normalized
    from cartodb_importer_spark.streaming import streams as S
    from cartodb_importer_spark.streaming.sinks import stream_to_catalog

    src_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    cat = LocalCatalog(str(tmp_path / "wh"))
    os.makedirs(cat._path("ev"))
    lockf = os.path.join(cat._path("ev"), M.LOCK_FILE)
    with open(lockf, "w") as f:
        f.write(f"{os.getpid()} {time.time()}\n")

    events = read_parquet_normalized(
        spark, "/root/testdata/sf0.001/events.parquet"
    )
    os.makedirs(src_dir, exist_ok=True)
    for i in range(4):
        chunk = events.filter(F.col("event_id") % 4 == i).limit(50)
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{i}")
        )
        part = _glob.glob(str(tmp_path / f"stage{i}") + "/part-*.parquet")[0]
        import shutil as _sh

        _sh.copy(part, f"{src_dir}/f{i}.parquet")
        os.utime(f"{src_dir}/f{i}.parquet", (1700000000 + i,) * 2)

    q = stream_to_catalog(
        S.read_events_stream(spark, src_dir), cat, "ev", ckpt,
        compact_every=2,
    )
    q.awaitTermination()  # would raise if a micro-batch died
    # ADVICE r11: the skip is counted on the query's sink_stats (and
    # warned), not silently swallowed
    assert q.sink_stats["compaction_skips"] == 1  # batch 2's attempt
    assert q.sink_stats["compactions"] == 0
    assert not os.path.isdir(os.path.join(cat._path("ev"), "_base"))
    assert len(cat.batch_ids("ev")) == 4  # nothing folded, nothing lost
    got = cat.read(spark, "ev")
    assert got.count() == 200
    assert os.path.exists(lockf)  # the stream never steals a live lock


@given(
    ops=hst.lists(
        hst.one_of(
            hst.tuples(hst.just("write"), hst.integers(0, 5), hst.integers(0, 9)),
            # compact below bid, killing the K-th rename (0 = clean run)
            hst.tuples(hst.just("compact"), hst.integers(0, 5), hst.integers(0, 2)),
        ),
        min_size=3,
        max_size=8,
    ),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_compaction_crash_schedules_read_like_uncompacted(spark, ops):
    """Crash-closure of the r10 property: for ANY interleaving of batch
    writes, replays, compactions, and compactor kills at either rename,
    every read between ops equals a never-compacted twin. (The r10 test
    locked crash-free schedules; ADVICE r10 showed the crashed ones were
    the dangerous ones.)"""
    import shutil as _sh
    import tempfile

    root = tempfile.mkdtemp(prefix="prop_crash_compact_")
    real_rename = os.rename
    try:
        cat = LocalCatalog(f"{root}/wh")
        plain = LocalCatalog(f"{root}/wh_plain")
        live: dict[int, int] = {}
        for kind, bid, arg in ops:
            if kind == "write":
                df = spark.createDataFrame(
                    [(bid * 100 + i, arg) for i in range(3)],
                    "id long, salt long",
                )
                if bid <= cat.compacted_up_to("t"):
                    import pytest as _pt

                    with _pt.raises(ValueError, match="already compacted"):
                        cat.replace_batch(df, "t", bid)
                    continue
                cat.replace_batch(df, "t", bid)
                plain.replace_batch(df, "t", bid)
                live[bid] = arg
            elif live:
                if arg == 0:
                    M.compact_batches(spark, cat, "t", keep_after_batch_id=bid)
                else:
                    calls = {"n": 0}

                    def boom(src, dst, _c=calls, _k=arg):
                        _c["n"] += 1
                        if _c["n"] == _k:
                            raise _SimulatedCrash()
                        real_rename(src, dst)

                    M._rename = boom
                    try:
                        try:
                            M.compact_batches(
                                spark, cat, "t", keep_after_batch_id=bid
                            )
                        except _SimulatedCrash:
                            pass  # killed mid-compaction; state on disk
                    finally:
                        M._rename = real_rename
                if live:
                    got = _canon_rows(cat.read(spark, "t"))
                    want = _canon_rows(plain.read(spark, "t"))
                    assert got == want
        if live:
            # one final clean compaction must converge the layout
            M.compact_batches(
                spark, cat, "t", keep_after_batch_id=max(live) + 1
            )
            got = _canon_rows(cat.read(spark, "t"))
            want = _canon_rows(plain.read(spark, "t"))
            assert got == want
    finally:
        M._rename = real_rename
        _sh.rmtree(root, ignore_errors=True)


# ------------------------------------------------- r11 review: lock corners
# Findings from the round's self-review: naive unlink-takeover let two
# claimants both acquire (the second deleted the first's FRESH lock), and
# unconditional release let an overrun holder delete its usurper's live
# lock. Takeover is now claim-by-rename (single winner) and release is
# own-token-only, with a heartbeat for long folds.


def test_lock_release_never_deletes_usurpers_lock(tmp_path):
    d = str(tmp_path)
    lock = os.path.join(d, M.LOCK_FILE)
    with M._compactor_lock(d) as heartbeat:
        heartbeat()  # refresh path works while held
        # simulate: we overran stale_sec and another actor took over
        os.unlink(lock)
        with open(lock, "wb") as f:
            f.write(b"usurper token\n")
    # our release must leave the usurper's live lock in place
    assert os.path.exists(lock)
    with open(lock, "rb") as f:
        assert f.read() == b"usurper token\n"
    os.unlink(lock)


def test_lock_heartbeat_refreshes_mtime(tmp_path):
    d = str(tmp_path)
    lock = os.path.join(d, M.LOCK_FILE)
    with M._compactor_lock(d) as heartbeat:
        os.utime(lock, (time.time() - 7000, time.time() - 7000))
        heartbeat()
        assert time.time() - os.stat(lock).st_mtime < 60
    assert not os.path.exists(lock)


def test_stale_takeover_race_loser_raises_and_winner_keeps_lock(
    tmp_path, monkeypatch
):
    """Two claimants race a stale lock: takeover is claim-by-RENAME, so
    the loser's rename fails, its retry sees the winner's fresh lock, and
    it raises — it must never unlink the winner's lock (the bug a naive
    unlink+retry takeover has)."""
    d = str(tmp_path)
    lock = os.path.join(d, M.LOCK_FILE)
    with open(lock, "w") as f:
        f.write("dead holder\n")
    os.utime(lock, (time.time() - 7200, time.time() - 7200))
    real_rename = os.rename

    def other_claimant_wins(src, dst):
        if src == lock:
            # interleave: the other claimant renames the stale lock away
            # and acquires a fresh one before OUR rename runs
            os.unlink(lock)
            with open(lock, "w") as f:
                f.write("winner fresh\n")
            raise FileNotFoundError(src)
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", other_claimant_wins)
    with pytest.raises(M.CompactionInProgress):
        with M._compactor_lock(d):
            pass
    monkeypatch.undo()
    with open(lock) as f:
        assert f.read() == "winner fresh\n"  # never clobbered
    os.unlink(lock)


def test_orphaned_stale_claim_file_is_swept(spark, tmp_path):
    """A takeover that crashed between its claim-rename and unlink leaves
    .compact_lock.stale_* behind; the next compaction sweeps it."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    cat.replace_batch(nation, "t", 0)
    orphan = os.path.join(cat._path("t"), f"{M.LOCK_FILE}.stale_dead1234")
    with open(orphan, "w") as f:
        f.write("orphan\n")
    assert M.compact_batches(spark, cat, "t", keep_after_batch_id=1) == 1
    assert not os.path.exists(orphan)
    # and on a pure no-op run too
    with open(orphan, "w") as f:
        f.write("orphan\n")
    assert M.compact_batches(spark, cat, "t", keep_after_batch_id=1) == 0
    assert not os.path.exists(orphan)


def test_heartbeat_does_not_refresh_usurpers_lock(tmp_path):
    """ADVICE r11: a holder that overran stale_sec and was taken over
    must NOT utime the usurper's lock — that would keep a (possibly
    dead) usurper lock artificially fresh and delay the next legitimate
    takeover."""
    d = str(tmp_path)
    lock = os.path.join(d, M.LOCK_FILE)
    old = time.time() - 7000
    with M._compactor_lock(d) as heartbeat:
        # simulate takeover: the usurper's lock replaces ours, aged so a
        # refresh would be detectable
        os.unlink(lock)
        with open(lock, "wb") as f:
            f.write(b"usurper token\n")
        os.utime(lock, (old, old))
        heartbeat()
        assert abs(os.stat(lock).st_mtime - old) < 5  # NOT refreshed
    assert os.path.exists(lock)  # release left it alone too
    os.unlink(lock)


def _fake_checkpoint(tmp_path, hwm: int) -> str:
    ckpt = str(tmp_path / "fake_ckpt")
    os.makedirs(os.path.join(ckpt, "commits"), exist_ok=True)
    for i in range(hwm + 1):
        with open(os.path.join(ckpt, "commits", str(i)), "w") as f:
            f.write("{}")
    return ckpt


def test_run_maintenance_bounds_landing_zone_out_of_band(spark, tmp_path):
    """VERDICT r11 item 3: the out-of-band loop folds committed batch
    dirs under the table's advisory lock while the caller (stream) does
    nothing but write — landing zone bounded, reads identical, stats
    observable."""
    import threading

    from cartodb_importer_spark.sinks.catalog import LocalCatalog

    cat = LocalCatalog(str(tmp_path / "wh"))
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    for i in range(6):
        cat.replace_batch(nation.filter(F.col("n_nationkey") % 6 == i), "t", i)
    before = _canon_rows(cat.read(spark, "t"))
    ckpt = _fake_checkpoint(tmp_path, hwm=5)  # ids < 5 are immutable

    stop = threading.Event()
    out: dict = {}
    th = threading.Thread(
        target=lambda: out.update(
            M.run_maintenance(
                spark, cat, "t", ckpt, stop, poll_sec=0.1, min_live_dirs=4
            )
        )
    )
    th.start()
    deadline = time.time() + 60
    while time.time() < deadline and len(cat.batch_ids("t")) > 1:
        time.sleep(0.2)
    stop.set()
    th.join(timeout=30)
    assert not th.is_alive()
    assert cat.batch_ids("t") == [5]  # only the replayable frontier left
    assert _canon_rows(cat.read(spark, "t")) == before
    assert out["compactions"] >= 1 and out["folded_dirs"] == 5
    assert out["cycles"] >= 1 and out["lock_skips"] == 0


def test_run_maintenance_lock_skip_warned_and_counted(spark, tmp_path, caplog):
    """A lock held by another actor makes the out-of-band loop SKIP with
    a warning and a counter — never kill the loop, never steal a fresh
    lock (ADVICE r11: skips must be observable)."""
    import logging
    import threading

    from cartodb_importer_spark.sinks.catalog import LocalCatalog

    cat = LocalCatalog(str(tmp_path / "wh"))
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    for i in range(4):
        cat.replace_batch(nation.filter(F.col("n_nationkey") % 4 == i), "t", i)
    lockf = os.path.join(cat._path("t"), M.LOCK_FILE)
    with open(lockf, "w") as f:
        f.write("other actor\n")  # fresh: within the stale window
    ckpt = _fake_checkpoint(tmp_path, hwm=3)

    stop = threading.Event()
    out: dict = {}
    th = threading.Thread(
        target=lambda: out.update(
            M.run_maintenance(
                spark, cat, "t", ckpt, stop, poll_sec=0.1, min_live_dirs=2
            )
        )
    )
    with caplog.at_level(logging.WARNING, logger=M.__name__):
        th.start()
        deadline = time.time() + 30
        while time.time() < deadline and not any(
            "skipped" in r.message for r in caplog.records
        ):
            time.sleep(0.1)
        stop.set()
        th.join(timeout=30)
    assert not th.is_alive()
    assert out["lock_skips"] >= 1 and out["compactions"] == 0
    assert len(cat.batch_ids("t")) == 4  # nothing folded
    assert any("skipped" in r.message for r in caplog.records)
    with open(lockf) as f:
        assert f.read() == "other actor\n"  # never stolen
    os.unlink(lockf)


def _stage_event_files(spark, tmp_path, src_dir, n_files, rows_per=50):
    """n single-file parquet drops into src_dir (one micro-batch each
    under maxFilesPerTrigger=1), mtime-ordered."""
    import glob as _glob
    import shutil as _sh

    from cartodb_importer_spark.queries import read_parquet_normalized

    events = read_parquet_normalized(
        spark, "/root/testdata/sf0.001/events.parquet"
    )
    os.makedirs(src_dir, exist_ok=True)
    for i in range(n_files):
        chunk = events.filter(F.col("event_id") % n_files == i).limit(rows_per)
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"oob_stage{i}")
        )
        part = _glob.glob(str(tmp_path / f"oob_stage{i}") + "/part-*.parquet")[0]
        _sh.copy(part, f"{src_dir}/f{i}.parquet")
        os.utime(f"{src_dir}/f{i}.parquet", (1700000000 + i,) * 2)
    return n_files * rows_per


def test_stream_with_out_of_band_maintenance_bounds_landing_zone(
    spark, tmp_path
):
    """VERDICT r11 item 3 end-to-end: the stream only CHECKS the landing
    zone (landing_max_dirs — one listdir per batch) while a concurrent
    run_maintenance loop compacts under the advisory lock. After the
    stream drains and maintenance catches up: zone bounded, exactly-once
    data, both sides' counters observable."""
    import threading

    from cartodb_importer_spark.sinks.catalog import LocalCatalog
    from cartodb_importer_spark.streaming import streams as S
    from cartodb_importer_spark.streaming.sinks import stream_to_catalog

    src_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    cat = LocalCatalog(str(tmp_path / "wh"))
    expected = _stage_event_files(spark, tmp_path, src_dir, n_files=6)

    stop = threading.Event()
    out: dict = {}
    th = threading.Thread(
        target=lambda: out.update(
            M.run_maintenance(
                spark, cat, "ev", ckpt, stop, poll_sec=0.2, min_live_dirs=3
            )
        )
    )
    th.start()
    try:
        q = stream_to_catalog(
            S.read_events_stream(spark, src_dir), cat, "ev", ckpt,
            landing_max_dirs=10,
        )
        q.awaitTermination()
        assert q.sink_stats["batches"] == 6
        assert q.sink_stats["compactions"] == 0  # sink never compacts
        # let maintenance catch up: the loop folds whenever live dirs
        # reach min_live_dirs, so the zone settles BELOW that bound (a
        # sub-bound tail of committed ids may legitimately remain)
        deadline = time.time() + 90
        while time.time() < deadline and len(cat.batch_ids("ev")) >= 3:
            time.sleep(0.2)
    finally:
        stop.set()
        th.join(timeout=30)
    assert not th.is_alive()
    assert out["compactions"] >= 1
    assert len(cat.batch_ids("ev")) < 3  # zone bounded by min_live_dirs
    assert os.path.isdir(os.path.join(cat._path("ev"), "_base"))
    got = cat.read(spark, "ev")
    assert got.count() == expected
    assert got.select("event_id").distinct().count() == expected


def test_stream_landing_max_dirs_warns_when_maintenance_absent(
    spark, tmp_path, caplog
):
    """landing_max_dirs with NO maintenance loop running: the sink must
    count + warn each batch the zone sits over the bound (the operator
    signal that run_maintenance is behind or was never started), while
    the stream itself keeps running and stays exactly-once."""
    import logging

    from cartodb_importer_spark.sinks.catalog import LocalCatalog
    from cartodb_importer_spark.streaming import sinks as SS
    from cartodb_importer_spark.streaming import streams as S

    src_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    cat = LocalCatalog(str(tmp_path / "wh"))
    expected = _stage_event_files(spark, tmp_path, src_dir, n_files=4)
    with caplog.at_level(logging.WARNING, logger=SS.__name__):
        q = SS.stream_to_catalog(
            S.read_events_stream(spark, src_dir), cat, "ev", ckpt,
            landing_max_dirs=2,
        )
        q.awaitTermination()
    # batches land dirs 1,2,3,4 -> over the bound of 2 after batches 2,3
    assert q.sink_stats["batches"] == 4
    assert q.sink_stats["landing_over_bound"] == 2
    assert any("landing zone" in r.message for r in caplog.records)
    assert len(cat.batch_ids("ev")) == 4  # sink itself never folds
    assert cat.read(spark, "ev").count() == expected


def test_stream_landing_max_dirs_validation(spark, tmp_path):
    from cartodb_importer_spark.sinks.catalog import Catalog, LocalCatalog
    from cartodb_importer_spark.streaming import streams as S
    from cartodb_importer_spark.streaming.sinks import stream_to_catalog

    src_dir = str(tmp_path / "incoming")
    _stage_event_files(spark, tmp_path, src_dir, n_files=1, rows_per=5)
    stream = S.read_events_stream(spark, src_dir)
    with pytest.raises(ValueError, match="landing_max_dirs"):
        stream_to_catalog(
            stream, LocalCatalog(str(tmp_path / "wh")), "t",
            str(tmp_path / "ck"), landing_max_dirs=0,
        )
    with pytest.raises(ValueError, match="LocalCatalog"):
        stream_to_catalog(
            stream, Catalog(), "t", str(tmp_path / "ck"), landing_max_dirs=4,
        )


def test_sweep_spares_live_writer_staging_dirs(spark, tmp_path):
    """The out-of-band race r12 found: a compactor's sweep must NOT
    delete a FRESH .batch_tmp_*/.batch_old_* — that is a live
    replace_batch's in-flight staging dir (the writer holds no lock).
    Only writer dirs older than WRITER_STALE_SEC are crashed attempts;
    compactor-owned .base_* dirs sweep unconditionally (serialized by
    the advisory lock)."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    for i in range(3):
        cat.replace_batch(nation.filter(F.col("n_nationkey") % 3 == i), "t", i)
    path = cat._path("t")
    fresh = os.path.join(path, ".batch_tmp_9_live1234")
    stale = os.path.join(path, ".batch_old_1_dead5678")
    basey = os.path.join(path, ".base_tmp_dead9abc")
    for d in (fresh, stale, basey):
        os.makedirs(d)
    old = time.time() - M.WRITER_STALE_SEC - 60
    os.utime(stale, (old, old))
    M.compact_batches(spark, cat, "t", keep_after_batch_id=2)
    assert os.path.isdir(fresh)      # live writer staging: spared
    assert not os.path.isdir(stale)  # crashed attempt: swept
    assert not os.path.isdir(basey)  # compactor-owned: swept


def test_run_maintenance_refuses_non_local_catalog(spark, tmp_path):
    """Same loud refusal as compact_batches: the loop depends on the
    LocalCatalog partition-dir layout; lakehouse catalogs run their
    native maintenance instead."""
    import threading

    from cartodb_importer_spark.sinks.catalog import Catalog

    with pytest.raises(ValueError, match="LocalCatalog"):
        M.run_maintenance(
            spark, Catalog(), "t", str(tmp_path / "ck"), threading.Event()
        )


def test_reader_grace_defers_folded_dir_deletion(spark, tmp_path):
    """r12 reader-isolation window: with reader_grace_sec > 0 a fold
    swaps the base in (folded dirs become read-invisible via the marker
    filter) but does NOT delete them until the base marker is older
    than the grace — an external scan planned before the fold keeps its
    files. Reads are identical throughout; once the marker ages past
    the grace, the next maintenance pass sweeps."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    for i in range(4):
        cat.replace_batch(nation.filter(F.col("n_nationkey") % 4 == i), "t", i)
    before = _canon_rows(cat.read(spark, "t"))
    path = cat._path("t")

    n = M.compact_batches(
        spark, cat, "t", keep_after_batch_id=3, reader_grace_sec=3600.0
    )
    assert n == 3
    # folded dirs survive on disk (reader grace); the graced fold
    # publishes a VERSION-ADDRESSED base (one rename, no classic _base)
    eff = LocalCatalog._effective_base(path)
    assert eff is not None and os.path.basename(eff).startswith("_base_")
    for i in range(3):
        assert os.path.isdir(os.path.join(path, f"__batch_id={i}"))
    # and they are read-INVISIBLE: results identical, no duplicates
    assert _canon_rows(cat.read(spark, "t")) == before

    # within the grace, a no-op pass must keep deferring
    assert M.compact_batches(
        spark, cat, "t", keep_after_batch_id=3, reader_grace_sec=3600.0
    ) == 0
    assert os.path.isdir(os.path.join(path, "__batch_id=0"))

    # age the marker past the grace: the next pass sweeps
    marker = os.path.join(eff, LocalCatalog.MARKER)
    old = time.time() - 7200
    os.utime(marker, (old, old))
    assert M.compact_batches(
        spark, cat, "t", keep_after_batch_id=3, reader_grace_sec=3600.0
    ) == 0
    for i in range(3):
        assert not os.path.isdir(os.path.join(path, f"__batch_id={i}"))
    assert _batch_dirs(path) == [f"{path}/__batch_id=3"]
    assert _canon_rows(cat.read(spark, "t")) == before


def test_scan_planned_before_fold_collects_correctly_under_grace(
    spark, tmp_path
):
    """The exact scenario the grace window exists for: a DataFrame whose
    file listing was snapshotted BEFORE a fold (Spark's InMemoryFileIndex
    lists eagerly) must still collect the correct rows AFTER the fold,
    because its files are deferred from deletion. This is the
    plan-to-execution window that immediate sweeping broke for external
    readers."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    for i in range(4):
        cat.replace_batch(nation.filter(F.col("n_nationkey") % 4 == i), "t", i)
    pre_planned = cat.read(spark, "t")  # listing snapshotted NOW
    before = _canon_rows(pre_planned)

    assert M.compact_batches(
        spark, cat, "t", keep_after_batch_id=3, reader_grace_sec=3600.0
    ) == 3
    # the pre-fold plan still executes against its snapshotted files
    assert _canon_rows(pre_planned) == before
    # and a fresh post-fold read agrees
    assert _canon_rows(cat.read(spark, "t")) == before


@given(
    ops=hst.lists(
        hst.one_of(
            hst.tuples(hst.just("write"), hst.integers(0, 5), hst.integers(0, 9)),
            hst.tuples(hst.just("fold"), hst.integers(0, 6), hst.just(0)),
            hst.tuples(hst.just("plan"), hst.just(0), hst.just(0)),
        ),
        min_size=4,
        max_size=9,
    ),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_reader_grace_any_schedule_keeps_preplanned_scans_valid(spark, ops):
    """Property form of the r12 reader-isolation fix: for ANY schedule of
    NEW-batch writes, graced folds, and scan plannings, every DataFrame
    planned at any point must still collect EXACTLY its planning-time
    rows at the end (no files vanished under it, no duplicate visibility
    from surviving folded dirs), and after the grace expires a final
    sweep still reads identically to a never-compacted twin.

    Replays are deliberately OUT of the schedule: a replayed batch id
    replaces its directory (replace_batch's insert-overwrite contract —
    the crash-recovery path), which legitimately invalidates a scan
    planned over the old attempt; the grace window protects readers from
    MAINTENANCE, not from the writer rewriting a failed batch. The first
    run of this property with replays enabled demonstrated exactly that
    distinction (FILE_NOT_EXIST on the replaced attempt's files).

    Under the grace the contract is STRICT (r12 versioned-base publish):
    every fold publishes a fresh ``_base_<marker>`` dir with one rename
    and leaves every predecessor base and batch dir untouched until the
    grace expires, so a scan planned at ANY point — including over an
    existing base that later folds supersede — collects exactly its
    planning-time rows. (The first iterations of this property caught,
    in order: the second fold deleting the first fold's retired base,
    then the classic two-rename swap breaking pre-planned base scans by
    renaming ``_base`` itself — which is what forced the
    version-addressed publish.)"""
    import shutil as _sh
    import tempfile

    from cartodb_importer_spark.sinks.catalog import LocalCatalog

    root = tempfile.mkdtemp(prefix="prop_grace_")
    try:
        cat = LocalCatalog(f"{root}/wh")
        plain = LocalCatalog(f"{root}/wh_plain")
        written: set[int] = set()
        planned = []  # (df, expected canon rows at planning time)
        for kind, bid, salt in ops:
            if kind == "write":
                if bid in written or bid <= cat.compacted_up_to("t"):
                    continue  # replays are the writer's own contract
                df = spark.createDataFrame(
                    [(bid * 100 + i, salt) for i in range(3)],
                    "id long, salt long",
                )
                cat.replace_batch(df, "t", bid)
                plain.replace_batch(df, "t", bid)
                written.add(bid)
            elif kind == "fold" and written:
                M.compact_batches(
                    spark, cat, "t", keep_after_batch_id=bid,
                    reader_grace_sec=3600.0,
                )
            elif kind == "plan" and written:
                df = cat.read(spark, "t")
                planned.append((df, _canon_rows(df)))
        if not written:
            return
        # every planning-time snapshot collects EXACTLY itself — the
        # versioned publish never moves or deletes a file a pre-planned
        # scan can reference within the grace
        for df, want in planned:
            assert _canon_rows(df) == want
        # grace expiry: age the live base's marker, sweep, reads match
        eff = LocalCatalog._effective_base(cat._path("t"))
        marker = os.path.join(eff, LocalCatalog.MARKER) if eff else ""
        if marker and os.path.exists(marker):
            old = time.time() - 7200
            os.utime(marker, (old, old))
            M.compact_batches(
                spark, cat, "t",
                keep_after_batch_id=cat.compacted_up_to("t") + 1,
                reader_grace_sec=3600.0,
            )
        assert _canon_rows(cat.read(spark, "t")) == _canon_rows(
            plain.read(spark, "t")
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)

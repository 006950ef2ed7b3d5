"""Snapshot-versioned warehouse writes — poor-man's time travel.

A training pipeline must be able to say exactly which bytes a model
was trained on. Mutable parquet directories can't; versioned immutable
snapshots can:

    base/v=0000/  part-*.parquet   (never rewritten)
    base/v=0001/  ...
    base/_latest                   (pointer file, written LAST)

Write protocol: materialize the new snapshot directory completely,
then flip the `_latest` pointer — readers either see the old pointer
(old snapshot, still intact) or the new one; never a half-written
directory. On a real object store the pointer write is the single
atomic operation this relies on (same design as Delta/Iceberg's
commit file, minus the manifest layer). Old snapshots stay readable
by version for reproducibility / rollback; retention is an explicit
`vacuum`, never implicit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_LATEST = "_latest"


def _vdir(base: str, version: int) -> str:
    return os.path.join(base, f"v={version:04d}")


def list_versions(base: str) -> list[int]:
    if not os.path.isdir(base):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(base)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )


def latest_version(base: str) -> int | None:
    """The committed latest — read from the pointer, NOT the listing
    (a directory may exist for an in-flight, uncommitted write)."""
    ptr = os.path.join(base, _LATEST)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return int(fh.read().strip())


def write_snapshot(df: DataFrame, base: str) -> int:
    """Write `df` as the next snapshot version and commit the pointer.

    Returns the new version number. The data write happens entirely
    before the pointer flip, so a crash mid-write leaves the previous
    snapshot live and the orphan directory invisible to readers.

    Concurrency (r6): racing writers are SAFE — each writes its data
    into a private staging directory, then claims a version number by
    atomically renaming the staged directory to `v=NNNN` (rename onto
    an existing directory fails with EEXIST/ENOTEMPTY, so a version can
    only ever be claimed once; the loser just retries with the next
    number, its data already written). The original formulation relied
    on Spark's errorifexists, whose driver-side existence check races —
    the r6 torture test (tests/test_concurrency.py) caught two writers
    interleaving files into ONE version directory. The pointer flip is
    serialized by a short-lived `_latest.lock` (O_CREAT|O_EXCL spin)
    and is forward-only, so a slow low-version writer can never roll
    the pointer back over a committed higher version. On object stores
    without atomic rename/create, use conditional puts for both steps.
    """
    import uuid

    os.makedirs(base, exist_ok=True)
    stage = os.path.join(base, f"_stage-{os.getpid()}-{uuid.uuid4().hex}")
    try:
        df.write.mode("errorifexists").parquet(stage)
        while True:
            versions = list_versions(base)
            version = (versions[-1] + 1) if versions else 0
            try:
                os.rename(stage, _vdir(base, version))
                break
            except OSError as e:
                import errno

                if e.errno not in (errno.EEXIST, errno.ENOTEMPTY):
                    raise
                # lost the claim race — the directory we just failed to
                # take belongs to a concurrent writer; try the next number
    except BaseException:
        # failed write or claim must not leak the staging directory;
        # writer *crashes* (no except runs) are swept by vacuum()
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        raise

    def flip() -> None:
        cur = latest_version(base)
        if cur is not None and cur >= version:
            return  # a higher version already committed — stay forward
        tmp = os.path.join(base, _LATEST + ".tmp")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(base, _LATEST))  # atomic flip

    _with_pointer_lock(base, flip)
    return version


def _with_pointer_lock(base: str, fn, attempts: int = 2000) -> None:
    """Run `fn` while holding `_latest.lock` (atomic O_CREAT|O_EXCL).
    The critical section is a sub-millisecond pointer check+replace, so
    a short bounded spin is enough; a crash inside it can orphan the
    lock — the wait is bounded and the error names the file to remove."""
    import time

    lockp = os.path.join(base, _LATEST + ".lock")
    for _ in range(attempts):
        try:
            fd = os.open(lockp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            time.sleep(0.005)
            continue
        try:
            fn()
            return
        finally:
            os.close(fd)
            os.unlink(lockp)
    raise RuntimeError(
        f"could not acquire {lockp} — remove it if a writer crashed"
    )


def read_snapshot(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame:
    """Read a specific version, or the committed latest."""
    if version is None:
        version = latest_version(base)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot under {base}")
    return spark.read.parquet(_vdir(base, version))


def snapshot_diff(
    spark: SparkSession, base: str, v_old: int, v_new: int, key: str
) -> DataFrame:
    """Row-level diff between two snapshots by key column: one row per
    changed key with change ∈ {added, removed}. Two key-only scans and
    one anti-join each way — the shuffle carries keys, not rows, so
    diffing two 100 TB snapshots costs two key-column scans."""
    from pyspark.sql import functions as F

    old = read_snapshot(spark, base, v_old).select(key)
    new = read_snapshot(spark, base, v_new).select(key)
    added = new.join(old, key, "left_anti").select(
        F.col(key), F.lit("added").alias("change")
    )
    removed = old.join(new, key, "left_anti").select(
        F.col(key), F.lit("removed").alias("change")
    )
    return added.unionByName(removed)


def vacuum(
    base: str, keep_last: int = 2, stage_ttl_s: float = 3600.0
) -> list[int]:
    """Delete all but the last `keep_last` versions (never the committed
    latest). Returns the versions removed. Explicit, so reproducibility
    is only given up on purpose.

    Also sweeps `_stage-*` directories older than `stage_ttl_s`. A
    stage's age is the NEWEST mtime anywhere under it, not the
    directory's own: a long parquet write accrues task files under
    `_stage/_temporary/...` without ever touching the top directory's
    mtime, so judging by the latter would rmtree a LIVE writer's stage
    as soon as the write outlasts the TTL (r7 review). A genuinely
    orphaned stage stops producing new files at the crash, so its
    newest mtime ages past any sane TTL; a live one always has a
    recent task file. Pass stage_ttl_s=None to skip the sweep."""
    import glob as _glob
    import shutil
    import time as _time

    latest = latest_version(base)
    versions = list_versions(base)
    removable = [v for v in versions[:-keep_last] if v != latest]
    for v in removable:
        shutil.rmtree(_vdir(base, v))
    if stage_ttl_s is not None:
        now = _time.time()
        for d in _glob.glob(os.path.join(base, "_stage-*")):
            try:
                newest = os.path.getmtime(d)
                for root, _dirs, files in os.walk(d):
                    newest = max(
                        newest,
                        os.path.getmtime(root),
                        *(
                            os.path.getmtime(os.path.join(root, f))
                            for f in files
                        ),
                    )
                if now - newest > stage_ttl_s:
                    shutil.rmtree(d, ignore_errors=True)
            except OSError:
                pass  # raced with its writer claiming/removing it
    return removable

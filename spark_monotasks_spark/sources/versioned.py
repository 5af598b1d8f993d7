"""Versioned snapshot tables: manifest-committed parquet with time
travel — the minimal lakehouse layout.

The reference's sinks overwrite or append files in place
(sources/interfaces.scala SaveMode semantics); at 100 TB that couples
readers to in-flight writes and makes "what data trained this run"
unanswerable.  The standard fix (Delta/Iceberg's core idea) is tiny:
data files are immutable, and a VERSION is a manifest listing exactly
the directories that belong to it.  Readers resolve a manifest first,
so they see a consistent snapshot no matter what a writer is doing;
the manifest rename is the single atomic commit point; old versions
stay readable (time travel) until vacuumed.

Layout::

    table/
      data/v1-3f2a9c1d/part-*.parquet   (immutable once committed)
      data/v2-b04e77aa/part-*.parquet
      _versions/v1.json   {"version":1,"dirs":["data/v1-3f2a9c1d"],...}
      _versions/v2.json   {"version":2,"dirs":["data/v1-...","data/v2-..."]}

Scale notes: the manifest holds directory names, not file lists — the
per-version metadata is O(commits), and Spark's parquet reader lists
splits inside each directory in parallel.  A crashed writer leaves an
orphan ``data/`` directory but NO manifest, so it is invisible to every
reader (write data first, fsync-rename the manifest last).  Data
directories carry a per-attempt random suffix, so a retry after a
mid-write crash stages into a FRESH directory instead of colliding
with the orphan — the sink self-recovers with no manual cleanup, and
``vacuum`` reaps manifest-less orphans as a side effect (don't run
vacuum concurrently with an in-flight writer: it cannot tell an orphan
from a not-yet-committed staging dir).  Readers of version N never
list directories created after N, so concurrent append+read needs no
locking.

The streaming replay watermark (``max_batch_id``) is carried forward
into EVERY manifest — append, overwrite, and compact alike — so
``vacuum`` dropping old manifests can never regress it and re-admit a
replayed micro-batch (see streaming.dstream.versioned_append_sink).
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the version this writer was targeting.
    The table is consistent; the caller should simply retry (the retry
    re-resolves the head and stages into a fresh data directory)."""


def _versions_dir(path: str) -> str:
    return os.path.join(path, "_versions")


def list_versions(path: str) -> list[int]:
    """Committed versions, ascending (a version exists iff its manifest
    does — data dirs without a manifest are invisible orphans)."""
    vdir = _versions_dir(path)
    if not os.path.isdir(vdir):
        return []
    out = []
    for f in os.listdir(vdir):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_versions_dir(path), f"v{version}.json")) as f:
        return json.load(f)


def write_version(
    df: DataFrame, path: str, mode: str = "append", batch_id: int | None = None
) -> int:
    """Commit ``df`` as the next version of the table at ``path``.

    ``append``: the new version sees all previous data plus ``df``.
    ``overwrite``: the new version sees only ``df`` (older versions
    still time-travel to the pre-overwrite data — nothing is deleted).
    Returns the committed version number.

    Commit protocol: write the immutable data directory, then create
    the manifest via atomic rename — a writer that dies mid-way leaves
    no manifest, so readers never see partial data.  The data directory
    name carries a random per-attempt suffix and the manifest records
    the ACTUAL name, so a retry after a mid-write crash never collides
    with the orphan (``errorifexists`` would otherwise fail every retry
    forever); the orphan stays invisible and is reaped by ``vacuum``.

    ``batch_id`` stamps the manifest with a streaming micro-batch id —
    ``last_committed_batch_id`` then lets an exactly-once sink skip
    replayed batches (see streaming.dstream.versioned_append_sink).
    The running max over all committed batch_ids is ALSO carried
    forward into every manifest (``max_batch_id``) so the watermark
    survives compact + vacuum dropping the stamped manifests.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    versions = list_versions(path)
    prev = _read_manifest(path, versions[-1]) if versions else None
    new_v = (versions[-1] + 1) if versions else 1
    rel_dir = f"data/v{new_v}-{uuid.uuid4().hex[:8]}"
    df.write.mode("errorifexists").parquet(os.path.join(path, rel_dir))
    dirs = [rel_dir]
    if mode == "append" and prev is not None:
        dirs = prev["dirs"] + dirs
    manifest = {"version": new_v, "mode": mode, "dirs": dirs}
    carried = -1
    if prev is not None:
        carried = prev.get("max_batch_id", prev.get("batch_id", -1))
    if batch_id is not None:
        manifest["batch_id"] = batch_id
        carried = max(carried, batch_id)
    if carried >= 0:
        manifest["max_batch_id"] = carried
    vdir = _versions_dir(path)
    os.makedirs(vdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=vdir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    # commit point: hard-link is atomic AND exclusive (rename would
    # silently overwrite a concurrent committer's manifest) — the loser
    # of a same-version race fails here, its data dir becomes an
    # invisible orphan for vacuum, and its retry targets the next
    # version number.  Optimistic concurrency without a lock service.
    final = os.path.join(vdir, f"v{new_v}.json")
    try:
        os.link(tmp, final)
    except FileExistsError:
        os.unlink(tmp)
        raise ConcurrentCommitError(
            f"version {new_v} at {path!r} was committed by a concurrent "
            "writer; re-run write_version to retry against the new head"
        ) from None
    os.unlink(tmp)
    return new_v


def last_committed_batch_id(path: str) -> int:
    """Largest batch id committed to the table, or -1 — the streaming
    sink's replay watermark.  Reads the carried-forward ``max_batch_id``
    (falling back to per-commit ``batch_id`` for manifests written
    before the carry-forward existed), scanning all surviving manifests
    so the answer is right even with a mixed-era history."""
    best = -1
    for v in list_versions(path):
        m = _read_manifest(path, v)
        b = m.get("max_batch_id", m.get("batch_id"))
        if b is not None and b > best:
            best = b
    return best


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: resolve the manifest (latest if ``version`` is
    None), scan exactly its directories.  Time travel = pass an older
    version number."""
    versions = list_versions(path)
    if not versions:
        raise ValueError(f"no committed versions at {path!r}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in committed versions {versions}")
    dirs = [os.path.join(path, d) for d in _read_manifest(path, v)["dirs"]]
    return spark.read.parquet(*dirs)


def read_changes(
    spark: SparkSession, path: str, since_version: int
) -> DataFrame:
    """Incremental read: rows added AFTER ``since_version`` — resolved
    purely from manifests (each version's NEW directories are the ones
    absent from its predecessor), so "read only new data since the last
    run" costs zero data listing of history.  This is the ingest-side
    complement of pipeline.dedup.incremental_exact_dedup.

    Overwrite commits restart lineage: their directory is new by
    definition, so a consumer that checkpoints ``since_version`` sees
    exactly the post-overwrite table once — the same contract as a
    stream reader observing a truncate+reload.
    """
    versions = list_versions(path)
    if since_version not in versions:
        raise ValueError(
            f"since_version {since_version} not in committed {versions}"
        )
    seen = set(_read_manifest(path, since_version)["dirs"])
    new_dirs: list[str] = []
    for v in versions:
        if v <= since_version:
            continue
        for d in _read_manifest(path, v)["dirs"]:
            if d not in seen:
                seen.add(d)
                new_dirs.append(d)
    if not new_dirs:
        return read_version(spark, path, since_version).limit(0)
    return spark.read.parquet(*[os.path.join(path, d) for d in new_dirs])


def vacuum(path: str, keep_versions: int = 1) -> list[str]:
    """Delete data directories unreachable from the newest
    ``keep_versions`` manifests (and drop the older manifests) —
    time travel shrinks to the kept window; current reads are
    untouched.  Manifest-less orphan directories (crashed writers) are
    reaped too, so don't run vacuum while a writer is mid-commit.
    The streaming replay watermark survives: every kept manifest
    carries ``max_batch_id`` forward.  Returns the deleted directory
    names."""
    import shutil

    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    versions = list_versions(path)
    kept = versions[-keep_versions:]
    live: set[str] = set()
    for v in kept:
        live.update(_read_manifest(path, v)["dirs"])
    removed = []
    data_root = os.path.join(path, "data")
    for d in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
        rel = f"data/{d}"
        if rel not in live:
            shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
            removed.append(rel)
    for v in versions:
        if v not in kept:
            os.remove(os.path.join(_versions_dir(path), f"v{v}.json"))
    return removed


def compact(
    spark: SparkSession, path: str, target_partitions: int
) -> int:
    """Commit a new OVERWRITE version holding the latest snapshot's
    rows rewritten into ``target_partitions`` files — the small-files
    fix after many appends.  History (pre-compaction versions) stays
    time-travelable until vacuumed; readers see either the old file
    set or the new one, never a mix (manifest atomicity)."""
    latest = read_version(spark, path)
    return write_version(
        latest.repartition(target_partitions), path, mode="overwrite"
    )


# ---------------------------------------------------------------------------
# multi-table atomic snapshots (cross-table transactions)
# ---------------------------------------------------------------------------

def _txns_dir(base: str) -> str:
    return os.path.join(base, "_txns")


def list_snapshots(base: str) -> list[int]:
    d = _txns_dir(base)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("t") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_txn(base: str, txn: int) -> dict:
    with open(os.path.join(_txns_dir(base), f"t{txn}.json")) as f:
        return json.load(f)


def snapshot_commit(
    dfs: dict[str, DataFrame],
    base: str,
    mode: str = "append",
    batch_id: int | None = None,
) -> int:
    """Commit SEVERAL tables as ONE atomic snapshot — the cross-table
    transaction single-table manifests cannot give (Delta's multi-table
    gap; Iceberg fixes it with catalog-level transactions): a reader
    resolving snapshot N sees every table at the same logical instant,
    so cross-table invariants (a fact and its rollup, orders and their
    lineitems) can never be observed half-updated.

    Protocol = the write_version idea lifted one level: each table's
    data stages into an immutable uniquely-suffixed directory, and the
    ONE transaction manifest (``_txns/tN.json``, committed by atomic
    exclusive hard-link) records every table's directory list.  A
    writer that dies after staging some tables leaves orphan
    directories but NO manifest — readers never see a torn snapshot —
    and the retry stages fresh directories.  Concurrent committers race
    on the hard link; the loser gets ConcurrentCommitError and retries
    against the new head.  ``append`` carries each table's previous
    directory list forward; ``overwrite`` replaces it.  Tables absent
    from ``dfs`` carry forward unchanged — a transaction may touch any
    subset.

    ``batch_id`` stamps the manifest with a streaming micro-batch id;
    the running max carries forward into every manifest
    (``max_batch_id``) exactly like write_version's, so
    :func:`last_snapshot_batch_id` gives an exactly-once streaming
    sink ONE replay watermark covering ALL tables — a replayed batch
    skips the whole transaction, never half of it.

    Scale: the manifest is O(tables x commits) directory NAMES; data
    files are immutable parquet written fully distributed.  Returns
    the committed snapshot id."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if not dfs:
        raise ValueError("snapshot_commit needs at least one table")
    snaps = list_snapshots(base)
    prev = _read_txn(base, snaps[-1]) if snaps else None
    new_t = (snaps[-1] + 1) if snaps else 1
    tables: dict[str, list[str]] = dict(prev["tables"]) if prev else {}
    for name, df in dfs.items():
        rel = f"{name}/data/t{new_t}-{uuid.uuid4().hex[:8]}"
        df.write.mode("errorifexists").parquet(os.path.join(base, rel))
        if mode == "append" and name in tables:
            tables[name] = tables[name] + [rel]
        else:
            tables[name] = [rel]
    manifest = {"txn": new_t, "mode": mode, "tables": tables}
    carried = -1
    if prev is not None:
        carried = prev.get("max_batch_id", prev.get("batch_id", -1))
    if batch_id is not None:
        manifest["batch_id"] = batch_id
        carried = max(carried, batch_id)
    if carried >= 0:
        manifest["max_batch_id"] = carried
    tdir = _txns_dir(base)
    os.makedirs(tdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=tdir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    final = os.path.join(tdir, f"t{new_t}.json")
    try:
        os.link(tmp, final)
    except FileExistsError:
        os.unlink(tmp)
        raise ConcurrentCommitError(
            f"snapshot {new_t} at {base!r} was committed by a concurrent "
            "writer; re-run snapshot_commit to retry against the new head"
        ) from None
    os.unlink(tmp)
    return new_t


def last_snapshot_batch_id(base: str) -> int:
    """The multi-table replay watermark: the max micro-batch id any
    committed snapshot carries (-1 if none) — resolved from the LATEST
    manifest only, since the running max is carried forward."""
    snaps = list_snapshots(base)
    if not snaps:
        return -1
    m = _read_txn(base, snaps[-1])
    return m.get("max_batch_id", m.get("batch_id", -1))


def snapshot_read(
    spark: SparkSession, base: str, table: str, txn: int | None = None
) -> DataFrame:
    """Read ``table`` AS OF snapshot ``txn`` (default: latest).  Two
    reads at the same ``txn`` — of different tables — are guaranteed
    mutually consistent: both resolve the one transaction manifest."""
    snaps = list_snapshots(base)
    if not snaps:
        raise ValueError(f"no snapshots at {base!r}")
    t = snaps[-1] if txn is None else txn
    if t not in snaps:
        raise ValueError(f"snapshot {t} not in {snaps}")
    m = _read_txn(base, t)
    if table not in m["tables"]:
        raise ValueError(f"table {table!r} not in snapshot {t}")
    dirs = [os.path.join(base, d) for d in m["tables"][table]]
    return spark.read.parquet(*dirs)


def snapshot_changes(
    spark: SparkSession, base: str, table: str, from_txn: int, to_txn: int
) -> DataFrame:
    """Incremental read: the rows ``table`` gained between ``from_txn``
    (exclusive) and ``to_txn`` (inclusive) — the change-data-feed a
    downstream incremental consumer reads instead of rescanning the
    snapshot (the read_changes idea lifted to the transaction store).
    Resolved purely from the two manifests' directory-list difference;
    an overwrite between the txns makes the delta undefined (the new
    dirs are a full replacement, not an increment) and raises."""
    snaps = list_snapshots(base)
    if from_txn not in snaps or to_txn not in snaps:
        raise ValueError(f"txns must be in {snaps}")
    if from_txn >= to_txn:
        raise ValueError("from_txn must precede to_txn")
    older = _read_txn(base, from_txn)["tables"].get(table, [])
    m_new = _read_txn(base, to_txn)
    newer = m_new["tables"].get(table, [])
    if not set(older) <= set(newer):
        raise ValueError(
            f"table {table!r} was overwritten between txn {from_txn} and "
            f"{to_txn}; the delta is not an increment — read the snapshot"
        )
    delta = [d for d in newer if d not in set(older)]
    if not delta:
        schema = spark.read.parquet(
            *[os.path.join(base, d) for d in newer]
        ).schema
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*[os.path.join(base, d) for d in delta])


def snapshot_vacuum(base: str, keep_snapshots: int = 1) -> list[str]:
    """Reap data directories no kept snapshot references (and the
    dropped txn manifests) — the vacuum step of the transaction store.
    Orphans from crashed writers go too.  Returns removed relative
    directory names.  Same caveat as table-level vacuum: don't run
    concurrently with an in-flight committer."""
    import shutil

    if keep_snapshots < 1:
        raise ValueError("keep_snapshots must be >= 1")
    snaps = list_snapshots(base)
    kept = snaps[-keep_snapshots:]
    live: set[str] = set()
    tables: set[str] = set()
    for t in snaps:
        tables.update(_read_txn(base, t)["tables"])
    for t in kept:
        for dirs in _read_txn(base, t)["tables"].values():
            live.update(dirs)
    removed = []
    for tbl in sorted(tables):
        data_root = os.path.join(base, tbl, "data")
        if not os.path.isdir(data_root):
            continue
        for d in sorted(os.listdir(data_root)):
            rel = f"{tbl}/data/{d}"
            if rel not in live:
                shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
                removed.append(rel)
    for t in snaps:
        if t not in kept:
            os.remove(os.path.join(_txns_dir(base), f"t{t}.json"))
    return removed


def snapshot_compact(
    spark: SparkSession, base: str, table: str, target_partitions: int
) -> int:
    """Commit a new transaction in which ``table``'s accumulated
    directories are rewritten into one ``target_partitions``-file
    directory (OVERWRITE for that table; every other table carries
    forward unchanged) — the small-files fix after many appended
    snapshots, scoped to one table of the store.  History stays
    time-travelable until snapshot_vacuum; readers see the old dirs or
    the new one, never a mix (txn-manifest atomicity)."""
    latest = snapshot_read(spark, base, table)
    snaps = list_snapshots(base)
    prev = _read_txn(base, snaps[-1])
    new_t = snaps[-1] + 1
    rel = f"{table}/data/t{new_t}-{uuid.uuid4().hex[:8]}"
    latest.repartition(target_partitions).write.mode("errorifexists").parquet(
        os.path.join(base, rel)
    )
    tables = dict(prev["tables"])
    tables[table] = [rel]
    manifest = {"txn": new_t, "mode": "overwrite", "tables": tables}
    carried = prev.get("max_batch_id", prev.get("batch_id", -1))
    if carried >= 0:
        manifest["max_batch_id"] = carried
    tdir = _txns_dir(base)
    fd, tmp = tempfile.mkstemp(dir=tdir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    final = os.path.join(tdir, f"t{new_t}.json")
    try:
        os.link(tmp, final)
    except FileExistsError:
        os.unlink(tmp)
        raise ConcurrentCommitError(
            f"snapshot {new_t} at {base!r} was committed by a concurrent "
            "writer; re-run snapshot_compact against the new head"
        ) from None
    os.unlink(tmp)
    return new_t

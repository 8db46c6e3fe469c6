"""Footer-stats kernel: the pure per-file functions the versioned
store's commit path ships to executors.

Why a separate module (ADVICE r13): the parallel stats job must ship
its closure BY VALUE (workers spawn from the driver's cwd with no repo
on sys.path — the real-cluster posture), but
``cloudpickle.register_pickle_by_value`` is a PROCESS-GLOBAL switch on
a whole module. Registering ``versioned`` itself made every subsequent
unrelated closure referencing that module serialize the full module —
including mutated module globals (a test-patched ``_STATS_LOCAL_MAX``)
— into executor tasks. This module is the minimal by-value surface:
pure functions over immutable constants, no store state, safe to keep
registered for the life of the process.

Everything here is deliberately dependency-free (stdlib + pyarrow,
imported lazily inside the function that needs it).
"""

from __future__ import annotations

# Business-key columns whose per-partition/per-file min/max ride in
# the manifest (the file-stats half of Iceberg's manifests — the
# reference's B-tree on (series_id, observation_time) analog,
# db_queries.sql:79-80). series_id is the axis every read filters on;
# observation_time bounds let a SUB-DAY time-range read prune below
# the date-partition grain.
STATS_COLS = ("series_id", "observation_time")

# Distrust footer min/max beyond this length: parquet writers may
# truncate or drop statistics for long binary values, and a truncated
# max understates the real bound — pruning on it would wrongly skip a
# partition. Business keys are short; anything longer loses stats,
# never correctness (absent stats = partition kept).
_STATS_MAX_LEN = 1024

# Fixed-width timestamp key: lexicographic order == chronological
# order, and both the stats writer and the reader's bound
# normalization MUST use the same format or pruning silently breaks.
# (Documentation constant — formatting goes through format_ts_key,
# NOT strftime: Linux strftime('%Y') does not zero-pad years < 1000,
# which would break the lexicographic invariant — ADVICE r13.)
_TS_KEY_FMT = "%Y-%m-%d %H:%M:%S.%f"


def format_ts_key(dt) -> str:
    """Render a NAIVE datetime as the store's fixed-width UTC key with
    explicit zero padding on every component. ``strftime`` is not used
    because glibc does not zero-pad ``%Y`` below year 1000 ('999-…'
    would sort AFTER '2024-…' and silently mis-prune). datetime caps
    the year at 9999, so four digits are always fixed-width."""
    return (
        f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d} "
        f"{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}.{dt.microsecond:06d}"
    )


def _stat_value(v):
    """Normalize one footer stat to a JSON-able, ORDER-PRESERVING
    string, or None to disqualify it. Strings pass within
    ``_STATS_MAX_LEN``. Timestamps (pyarrow hands back tz-aware
    datetimes for TIMESTAMP_MICROS columns) become fixed-width UTC
    strings whose lexicographic order is their chronological order.
    Anything else is disqualified — the manifest is JSON, and
    comparison across a JSON round-trip is only safe for strings we
    format ourselves."""
    import datetime as _dt

    if isinstance(v, str):
        return v if len(v) <= _STATS_MAX_LEN else None
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return format_ts_key(v)
    return None


def _file_stats(path: str) -> dict:
    """Footer min/max of ONE parquet file: ``{col: [min, max] | None}``
    over STATS_COLS. ``None`` marks the column untrustworthy in this
    file (missing from the schema, no row-group stats, or a value the
    JSON manifest can't compare safely). An unreadable footer returns
    all-None (every column disqualified); a zero-row-group file
    returns ``{}`` (the merge identity — it contributes nothing and
    disqualifies nothing). This is the shared kernel of the serial
    reader and the parallelized commit job, so the two cannot
    drift."""
    import pyarrow.parquet as pq

    bad = {c: None for c in STATS_COLS}
    try:
        md = pq.ParquetFile(path).metadata
    except Exception:
        return bad
    if md.num_row_groups == 0:
        return {}
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict = {}
    for c in STATS_COLS:
        j = idx.get(c)
        if j is None:
            out[c] = None
            continue
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(j).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mn, mx = _stat_value(st.min), _stat_value(st.max)
            if mn is None or mx is None:
                ok = False
                break
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        out[c] = [lo, hi] if ok and lo is not None else None
    return out

"""Survival / process-state analytics over the event stream.

Two operators a training-data curation loop runs on user telemetry:

- ``kaplan_meier_retention``: the Kaplan-Meier estimator of user
  lifetime (days between first and last event), right-censoring users
  still active near the stream horizon — the standard churn/retention
  curve, computed without any per-user Python.
- ``markov_stationary``: the damped (PageRank-style) stationary
  distribution of the event-type Markov chain — "where does a user
  session spend its time in the long run", the summary a
  recommendation/funnel step reads.

Float discipline (matches the rest of the repo): every aggregate is
exact integer arithmetic end-to-end; the ONLY float operations are
final divisions/multiplies written identically in the DuckDB oracle,
so values compare bit-exact under the driver's string hash.

Scale shape: both operators reduce the stream to a bounded table
(#distinct-lifetimes rows, or K^2 transition rows for K event types)
via one keyed hash aggregate; the final fold runs driver-side over
that bounded table only.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCALE = 10**18  # fixed-point one for the stationary iteration


def _epoch_day(ts_col) -> pa.Array:
    us = pc.cast(pc.cast(ts_col, pa.timestamp("us")), pa.int64())
    return pc.divide(us, 86_400_000_000)  # integer division on int64


def kaplan_meier_retention(events, gap_sec: int = 1800):
    """Kaplan-Meier survival of SESSION duration in minutes.

    Sessions are the standard gap-based kind (a break is a gap >
    ``gap_sec`` between a user's consecutive events); the subject of
    the survival analysis is the session, its lifetime is
    ``(last_sec - first_sec) // 60`` whole minutes, and a session is
    right-CENSORED when it ends within ``gap_sec`` of the stream
    horizon (another event could still have extended it).  Standard
    KM: at each distinct duration t with d_t completed sessions, n_t
    sessions still at risk (duration >= t),
    S(t) = prod_{t_i<=t} (1 - d_i/n_i), folded sequentially in
    ascending t (the oracle replays the identical left-fold via a
    recursive CTE, so the float product matches bit-for-bit).

    Scale shape: one hash shuffle by user sessionizes each block
    vectorized (grouped_map); the slim per-session rows are pinned
    (two consumers: the horizon max and the duration histogram); the
    keyed duration aggregate is bounded by #distinct whole-minute
    durations, and only that bounded table reaches the driver.

    Output: (duration_min, n_risk, n_churned, survival) — one row per
    duration with at least one completed session.
    """
    from ray.data.aggregate import Max, Sum

    from ocr_ray.ops.windows import _epoch_seconds
    from ocr_ray.stages.grouped import grouped_map

    sess_schema = pa.schema(
        [("duration_min", pa.int64()), ("end_sec", pa.int64())]
    )

    def sessions(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0 or len(starts) == 0:
            return sess_schema.empty_table()
        secs = np.asarray(_epoch_seconds(block["ts"]), dtype=np.int64)
        sizes = np.diff(np.append(starts, n))
        gidx = np.repeat(np.arange(len(starts)), sizes)
        brk = np.ones(n, dtype=np.int64)
        same_user = gidx[1:] == gidx[:-1]
        brk[1:] = np.where(
            same_user & (secs[1:] - secs[:-1] <= gap_sec), 0, 1
        )
        sid = np.cumsum(brk) - 1  # global session index, contiguous
        # min/max sec per session via reduceat over the sorted stream
        s_start = np.flatnonzero(brk)
        first = secs[s_start]
        last = np.maximum.reduceat(secs, s_start)
        return pa.table(
            {
                "duration_min": pa.array(
                    (last - first) // 60, pa.int64()
                ),
                "end_sec": pa.array(last, pa.int64()),
            }
        )

    sess = grouped_map(
        events, ["user_id"], sessions, sort_within=["ts", "event_id"]
    ).materialize()  # one slim row per session; two consumers below

    mx = sess.aggregate(Max("end_sec", alias_name="mx"))["mx"]
    empty_out = pa.table(
        {
            "duration_min": pa.array([], pa.int64()),
            "n_risk": pa.array([], pa.int64()),
            "n_churned": pa.array([], pa.int64()),
            "survival": pa.array([], pa.float64()),
        }
    )
    if mx is None:
        return empty_out
    cutoff = int(mx) - gap_sec

    part_schema = pa.schema(
        [("lifetime", pa.int64()), ("d", pa.int64()), ("m", pa.int64())]
    )

    def steps(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return part_schema.empty_table()
        life = t["duration_min"].to_numpy(zero_copy_only=False)
        end = t["end_sec"].to_numpy(zero_copy_only=False)
        churn = (end <= cutoff).astype(np.int64)
        uniq, inv = np.unique(life, return_inverse=True)
        return pa.table(
            {
                "lifetime": pa.array(uniq.astype(np.int64), pa.int64()),
                "d": pa.array(
                    np.bincount(inv, weights=churn).astype(np.int64),
                    pa.int64(),
                ),
                "m": pa.array(
                    np.bincount(inv).astype(np.int64), pa.int64()
                ),
            }
        )

    rows = (
        sess.map_batches(steps, batch_format="pyarrow")
        .groupby("lifetime")
        .aggregate(Sum("d", alias_name="d"), Sum("m", alias_name="m"))
    ).take_all()  # bounded by #distinct whole-minute durations
    rows.sort(key=lambda r: r["lifetime"])

    total = sum(int(r["m"]) for r in rows)
    out_life, out_risk, out_d, out_s = [], [], [], []
    seen = 0
    s = 1.0
    for r in rows:
        n_risk = total - seen
        seen += int(r["m"])
        d = int(r["d"])
        if d == 0:
            continue
        s = s * (1.0 - float(d) / float(n_risk))
        out_life.append(int(r["lifetime"]))
        out_risk.append(n_risk)
        out_d.append(d)
        out_s.append(s)
    return pa.table(
        {
            "duration_min": pa.array(out_life, pa.int64()),
            "n_risk": pa.array(out_risk, pa.int64()),
            "n_churned": pa.array(out_d, pa.int64()),
            "survival": pa.array(out_s, pa.float64()),
        }
    )


def kaplan_meier_retention_sql(gap_sec: int = 1800) -> str:
    return (
        "WITH RECURSIVE e AS (\n"
        " SELECT user_id, ts, event_id, epoch_us(ts)//1000000 AS sec,\n"
        "  CASE WHEN epoch_us(ts)//1000000\n"
        "        - LAG(epoch_us(ts)//1000000) OVER\n"
        "          (PARTITION BY user_id ORDER BY ts, event_id)\n"
        f"       <= {gap_sec} THEN 0 ELSE 1 END AS brk\n"
        " FROM events\n"
        "), g AS (\n"
        " SELECT user_id, sec,\n"
        "  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id\n"
        "   ROWS UNBOUNDED PRECEDING) AS sid\n"
        " FROM e\n"
        "), u AS (\n"
        " SELECT (MAX(sec) - MIN(sec)) // 60 AS lifetime,\n"
        "  MAX(sec) AS end_sec\n"
        " FROM g GROUP BY user_id, sid\n"
        "), mx AS (SELECT MAX(end_sec) AS max_sec FROM u),\n"
        "t AS (\n"
        " SELECT lifetime,\n"
        f"  CASE WHEN end_sec <= mx.max_sec - {gap_sec} THEN 1 ELSE 0 END AS churn\n"
        " FROM u, mx\n"
        "), st AS (\n"
        " SELECT lifetime, SUM(churn) AS d, COUNT(*) AS m FROM t GROUP BY lifetime\n"
        "), rk AS (\n"
        " SELECT lifetime, d, m,\n"
        "  SUM(m) OVER (ORDER BY lifetime DESC) AS n_risk\n"
        " FROM st\n"
        "), seq AS (\n"
        " SELECT lifetime, d, n_risk,\n"
        "  ROW_NUMBER() OVER (ORDER BY lifetime) AS rn\n"
        " FROM rk WHERE d > 0\n"
        "), km AS (\n"
        " SELECT rn, lifetime, d, n_risk,\n"
        "  (1.0 - CAST(d AS DOUBLE)/CAST(n_risk AS DOUBLE)) AS survival\n"
        " FROM seq WHERE rn = 1\n"
        " UNION ALL\n"
        " SELECT s.rn, s.lifetime, s.d, s.n_risk,\n"
        "  k.survival * (1.0 - CAST(s.d AS DOUBLE)/CAST(s.n_risk AS DOUBLE))\n"
        " FROM km k JOIN seq s ON s.rn = k.rn + 1\n"
        ")\n"
        "SELECT lifetime AS duration_min, CAST(n_risk AS BIGINT) AS n_risk,\n"
        " CAST(d AS BIGINT) AS n_churned, survival\n"
        "FROM km"
    )


def markov_stationary(events, iters: int = 20, damping: int = 85):
    """Damped stationary distribution of the event-type Markov chain.

    Transition counts come from ``event_transitions`` (one hash shuffle
    of the stream by user, vectorized consecutive-pair bincount per
    block, K^2-bounded result).  The power iteration then runs
    driver-side over the K-state chain in pure FIXED-POINT integer
    arithmetic (scale 10^18), with uniform restart mass
    ``(100-damping)%`` each step — the PageRank formulation, so states
    without outgoing transitions (sinks) leak walk mass that the
    restart term replaces, keeping the iteration well-defined on any
    stream shape:

        v'_j = (15*(S//K))//100 + (85 * sum_i (v_i*c_ij)//r_i)//100

    Every operation is integer (order-independent sums), so the oracle
    replays the identical iteration with HUGEINT arithmetic in
    ``iters`` unrolled CTEs and the fixed-point vector compares
    EXACTLY; the only floats are the final normalized shares.

    Output: (event_type, v_fixed, pi) sorted by event_type, where
    v_fixed is the raw fixed-point mass and pi = v/sum(v).
    """
    from ocr_ray.ops.windows import event_transitions

    pairs_tbl = event_transitions(events).take_all()  # <= K^2 rows
    states = sorted(
        {r["prev_type"] for r in pairs_tbl}
        | {r["next_type"] for r in pairs_tbl}
    )
    k = len(states)
    if k == 0:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "v_fixed": pa.array([], pa.int64()),
                "pi": pa.array([], pa.float64()),
            }
        )
    pairs = {
        (r["prev_type"], r["next_type"]): int(r["n"]) for r in pairs_tbl
    }
    r_out: dict[str, int] = {}
    for (p, _nx), c in pairs.items():
        r_out[p] = r_out.get(p, 0) + c

    base = ((100 - damping) * (SCALE // k)) // 100
    v = {s: SCALE // k for s in states}
    for _ in range(iters):
        acc = {s: 0 for s in states}
        for (p, nx), c in pairs.items():
            acc[nx] += (v[p] * c) // r_out[p]
        v = {s: base + (damping * acc[s]) // 100 for s in states}

    total = sum(v.values())
    return pa.table(
        {
            "event_type": pa.array(states, pa.string()),
            "v_fixed": pa.array([v[s] for s in states], pa.int64()),
            "pi": pa.array(
                [float(v[s]) / float(total) for s in states], pa.float64()
            ),
        }
    )


def markov_stationary_sql(iters: int = 20, damping: int = 85) -> str:
    """Unrolled fixed-point iteration (no aggregate-in-recursive-CTE
    restriction to fight): v0..v{iters} chained CTEs over the pairs
    table, HUGEINT arithmetic identical to the Python loop."""
    # every CTE is MATERIALIZED: DuckDB would otherwise inline the
    # whole chain into each reference and replanning goes exponential
    # in the iteration count (measured 220 s for 20 iterations at
    # sf0.01 vs <1 s materialized)
    head = (
        "WITH seq AS MATERIALIZED (\n"
        " SELECT user_id, event_type,\n"
        "  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt\n"
        " FROM events\n"
        "), pairs AS MATERIALIZED (\n"
        " SELECT event_type AS prev, nxt AS next_t, COUNT(*)::HUGEINT AS c\n"
        " FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt\n"
        "), outs AS MATERIALIZED (\n"
        " SELECT prev, SUM(c) AS r FROM pairs GROUP BY prev\n"
        "), states AS MATERIALIZED (\n"
        " SELECT prev AS s FROM pairs UNION SELECT next_t FROM pairs\n"
        "), kk AS MATERIALIZED (SELECT COUNT(*)::HUGEINT AS k FROM states),\n"
        f"cst AS MATERIALIZED (SELECT (({100 - damping}::HUGEINT * ({SCALE}::HUGEINT // k)) // 100) AS base,\n"
        f" ({SCALE}::HUGEINT // k) AS v_init FROM kk),\n"
        "v0 AS MATERIALIZED (SELECT st.s, cst.v_init AS v FROM states st, cst)"
    )
    steps = []
    for i in range(iters):
        steps.append(
            f", v{i + 1} AS MATERIALIZED (\n"
            " SELECT st.s,\n"
            f" cst.base + ({damping}::HUGEINT * COALESCE(m.acc, 0::HUGEINT)) // 100 AS v\n"
            " FROM states st CROSS JOIN cst LEFT JOIN (\n"
            f"  SELECT p.next_t AS s, SUM((v.v * p.c) // o.r) AS acc\n"
            f"  FROM v{i} v JOIN pairs p ON p.prev = v.s JOIN outs o ON o.prev = v.s\n"
            "  GROUP BY p.next_t\n"
            " ) m ON m.s = st.s\n"
            ")"
        )
    tail = (
        f"\nSELECT s AS event_type, CAST(v AS BIGINT) AS v_fixed,\n"
        f" CAST(v AS DOUBLE) / CAST((SELECT SUM(v) FROM v{iters}) AS DOUBLE) AS pi\n"
        f"FROM v{iters}"
    )
    return head + "".join(steps) + tail


def markov_eval_accuracy(events, cutoff_day: int = 15):
    """Temporal-holdout evaluation of the Markov next-event predictor:
    train = transition pairs whose NEXT event lands before
    first_day + ``cutoff_day``, eval = the rest; the model predicts,
    per prev type, the train-mode next type (ties lexicographic), with
    the global train mode as the unseen-prev fallback — the
    train/test-discipline template every sequence-model eval follows,
    over the same K²-bounded transition statistics.

    Scale shape: one scalar min-day aggregate, then ONE hash shuffle
    of the stream by user where each block bincounts its consecutive
    pairs into (prev, next, is_train) cells (≤ 2K² slim rows per
    block); the model fit and the scoring fold driver-side over the
    bounded cell table.  Exact integers; accuracy is the single float
    division.

    Output: one row (n_train, n_eval, n_correct, accuracy).  With an
    empty train side nothing can be scored: (0, 0, 0, 0.0).
    """
    from ray.data.aggregate import Min, Sum

    from ocr_ray.ops.dedup import _with_schema
    from ocr_ray.stages.grouped import grouped_map

    days_ds = events.map_batches(
        lambda t: pa.table({"day": _epoch_day(t["ts"])}),
        batch_format="pyarrow",
    )
    d0 = days_ds.aggregate(Min("day", alias_name="d0"))["d0"]
    zero = pa.table(
        {
            "n_train": pa.array([0], pa.int64()),
            "n_eval": pa.array([0], pa.int64()),
            "n_correct": pa.array([0], pa.int64()),
            "accuracy": pa.array([0.0], pa.float64()),
        }
    )
    if d0 is None:
        return zero
    cut = int(d0) + cutoff_day

    schema = pa.schema(
        [
            ("prev_type", pa.string()),
            ("next_type", pa.string()),
            ("tr", pa.int64()),
            ("c", pa.int64()),
        ]
    )

    def block_fn(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n < 2 or len(starts) == 0:
            return schema.empty_table()
        types = np.asarray(
            block.column("event_type").to_pylist(), dtype=object
        )
        days = np.asarray(_epoch_day(block["ts"]), dtype=np.int64)
        uniq, codes = np.unique(types, return_inverse=True)
        k = len(uniq)
        sizes = np.diff(np.append(starts, n))
        gidx = np.repeat(np.arange(len(starts)), sizes)
        within = gidx[1:] == gidx[:-1]
        tr = (days[1:][within] < cut).astype(np.int64)
        keys = (codes[:-1][within] * k + codes[1:][within]) * 2 + tr
        counts = np.bincount(keys, minlength=k * k * 2)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "prev_type": pa.array(uniq[(nz // 2) // k], pa.string()),
                "next_type": pa.array(uniq[(nz // 2) % k], pa.string()),
                "tr": pa.array((nz % 2).astype(np.int64), pa.int64()),
                "c": pa.array(counts[nz].astype(np.int64), pa.int64()),
            }
        )

    partials = grouped_map(
        events, ["user_id"], block_fn, sort_within=["ts", "event_id"]
    )
    cells = (
        _with_schema(partials, schema)
        .groupby(["prev_type", "next_type", "tr"])
        .aggregate(Sum("c", alias_name="c"))
    ).take_all()  # <= 2K^2 rows

    train: dict[tuple[str, str], int] = {}
    evals: dict[tuple[str, str], int] = {}
    for r in cells:
        key = (r["prev_type"], r["next_type"])
        if int(r["tr"]) == 1:
            train[key] = train.get(key, 0) + int(r["c"])
        else:
            evals[key] = evals.get(key, 0) + int(r["c"])
    n_train = sum(train.values())
    if n_train == 0:
        return zero
    # per-prev mode; iterating next ascending keeps the lexicographic
    # smallest on count ties (matching ORDER BY c DESC, nxt ASC rn=1)
    pred: dict[str, str] = {}
    for (p, nx), c in sorted(train.items()):
        if p not in pred or c > train[(p, pred[p])]:
            pred[p] = nx
    gmode_counts: dict[str, int] = {}
    for (_p, nx), c in train.items():
        gmode_counts[nx] = gmode_counts.get(nx, 0) + c
    gmode = sorted(
        gmode_counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[0][0]
    n_eval = sum(evals.values())
    n_correct = sum(
        c for (p, nx), c in evals.items() if pred.get(p, gmode) == nx
    )
    return pa.table(
        {
            "n_train": pa.array([n_train], pa.int64()),
            "n_eval": pa.array([n_eval], pa.int64()),
            "n_correct": pa.array([n_correct], pa.int64()),
            "accuracy": pa.array(
                [
                    float(n_correct) / float(n_eval) if n_eval else 0.0
                ],
                pa.float64(),
            ),
        }
    )


def markov_eval_accuracy_sql(cutoff_day: int = 15) -> str:
    return (
        "WITH b AS (SELECT MIN(epoch_us(ts)//1000000//86400) AS d0"
        " FROM events),\n"
        "seq AS (\n"
        " SELECT user_id, event_type AS prev,\n"
        "  LEAD(event_type) OVER w AS nxt,\n"
        "  LEAD(epoch_us(ts)//1000000//86400) OVER w AS nday\n"
        " FROM events\n"
        " WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)\n"
        "), p AS (\n"
        f" SELECT prev, nxt,"
        f" CASE WHEN nday < b.d0 + {cutoff_day} THEN 1 ELSE 0 END AS tr\n"
        " FROM seq, b WHERE nxt IS NOT NULL\n"
        "), tc AS (\n"
        " SELECT prev, nxt, COUNT(*) AS c FROM p WHERE tr = 1 GROUP BY 1, 2\n"
        "), pred AS (\n"
        " SELECT prev, nxt AS pr FROM (\n"
        "  SELECT prev, nxt,\n"
        "   ROW_NUMBER() OVER (PARTITION BY prev ORDER BY c DESC, nxt ASC)"
        " AS rn\n"
        "  FROM tc) t WHERE rn = 1\n"
        "), gmode AS (\n"
        " SELECT nxt AS gpr FROM (SELECT nxt, SUM(c) AS c FROM tc"
        " GROUP BY 1) t\n"
        " ORDER BY c DESC, nxt ASC LIMIT 1\n"
        "), scored AS (\n"
        " SELECT CASE WHEN COALESCE(pred.pr, g.gpr) = ev.nxt THEN 1 ELSE 0"
        " END AS ok\n"
        " FROM (SELECT prev, nxt FROM p WHERE tr = 0) ev\n"
        " LEFT JOIN pred ON pred.prev = ev.prev CROSS JOIN gmode g\n"
        ")\n"
        "SELECT\n"
        " CAST(COALESCE((SELECT SUM(c) FROM tc), 0) AS BIGINT) AS n_train,\n"
        " CAST(COUNT(*) AS BIGINT) AS n_eval,\n"
        " CAST(COALESCE(SUM(ok), 0) AS BIGINT) AS n_correct,\n"
        " CASE WHEN COUNT(*) > 0 THEN\n"
        "  CAST(SUM(ok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)\n"
        " ELSE 0.0 END AS accuracy\n"
        "FROM scored"
    )

"""In-process aggregation engine — the serving-tier mirror of
`aggregations.run_aggregation`.

The reference runs aggregations through the searcher
(`searcher.search(query, AggregationCollector)`, src/aggregation/
collector.rs:83-118): segment collectors read fast-field columns of the
MATCHING docs and the fruits merge.  The distributed engine maps that to
Catalyst (aggregations.py); this module is the same request dialect over
an in-memory pandas frame so the Spark-free ServingSearcher can answer
query-scoped aggregations at interactive latency.

Parity contract: same ES-shaped request dict, same output column names,
same row ordering, same null/missing semantics as `run_aggregation`
(null bucket keys group together and sort nulls-first ascending /
nulls-last descending, exactly Spark's ordering).  Differences, all
explicit errors rather than silent divergence:

* approximate sketches run on the SERVING-SIDE mergeable partials —
  DDSketch percentiles (`functions/ddsketch.py`, the reference's own
  algorithm, alpha=0.01) and HLL cardinality (`functions/hll.py`,
  rsd->lg_k like Spark) — with the same error bounds as the distributed
  engine's `percentile_approx` / HLL++ but NOT value-identical to them
  (different sketch constants; the same documented tolerance-contract
  stance as the agg_percentiles_ddsketch / agg_cardinality_hll oracle
  entries).  Exact variants are value-identical across engines.
* `terms` `shard_size` raises — it is the distributed shard-merge error
  protocol; a single-process reader is always exact (error bound 0).
* `filter` conditions: a callable(pdf) -> bool mask, or a string /
  AST list in the SHARED portable predicate language
  (plans/predicate.py) — the same dialect, Spark-null (Kleene)
  semantics, and PredicateError as the distributed `filter_agg`; the
  old pandas.eval dialect-overlap trap is gone.

Scale note: this engine aggregates one query's match set in one
process — the serving posture.  Corpus-scale aggregations belong on the
distributed path (`Searcher.aggregate`), which shuffles once on the
bucket key.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tantivy_spark.operators.aggregations import (
    DEFAULT_BUCKET_LIMIT,
    AggregationLimitError,
    parse_fixed_interval_ms,
)

# --------------------------------------------------------------------------
# metric sub-aggregations (mirror of aggregations._metric_exprs)
# --------------------------------------------------------------------------


def metric_colnames(name: str, spec: dict) -> list[str]:
    """Output column names one metric spec expands to — identical to the
    aliases `aggregations._metric_exprs` produces."""
    kind, body = next(iter(spec.items()))
    if kind == "stats":
        return [f"{name}_{s}" for s in ("count", "sum", "min", "max", "avg")]
    if kind == "extended_stats":
        return [f"{name}_{s}" for s in (
            "count", "sum", "min", "max", "avg",
            "sum_of_squares", "variance", "std_deviation")]
    if kind == "percentiles":
        pcts = body.get("percents", [1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0])
        return [f"{name}_p{str(p).replace('.', '_')}" for p in pcts]
    return [name]


def _metric_values(g: pd.DataFrame, name: str, spec: dict) -> dict:
    kind, body = next(iter(spec.items()))
    field = body.get("field")
    v = g[field] if field else None
    nn = v.dropna() if v is not None else None

    def some(fn):
        # Spark aggregates over an all-null/empty column yield null
        return fn(nn) if nn is not None and len(nn) else np.nan

    if kind == "avg":
        return {name: some(lambda s: float(s.mean()))}
    if kind == "sum":
        return {name: some(lambda s: s.sum())}
    if kind == "min":
        return {name: some(lambda s: s.min())}
    if kind == "max":
        return {name: some(lambda s: s.max())}
    if kind in ("count", "doc_count"):
        return {name: np.int64(len(g))}
    if kind == "value_count":
        return {name: np.int64(len(nn))}
    if kind == "stats":
        return {
            f"{name}_count": np.int64(len(nn)),
            f"{name}_sum": some(lambda s: s.sum()),
            f"{name}_min": some(lambda s: s.min()),
            f"{name}_max": some(lambda s: s.max()),
            f"{name}_avg": some(lambda s: float(s.mean())),
        }
    if kind == "extended_stats":
        return {
            f"{name}_count": np.int64(len(nn)),
            f"{name}_sum": some(lambda s: s.sum()),
            f"{name}_min": some(lambda s: s.min()),
            f"{name}_max": some(lambda s: s.max()),
            f"{name}_avg": some(lambda s: float(s.mean())),
            f"{name}_sum_of_squares": some(
                lambda s: float((s.astype("float64") ** 2).sum())),
            f"{name}_variance": some(lambda s: float(s.var(ddof=0))),
            f"{name}_std_deviation": some(lambda s: float(s.std(ddof=0))),
        }
    if kind == "percentiles":
        pcts = body.get("percents", [1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0])
        vals = (nn.to_numpy(dtype="float64")
                if nn is not None and len(nn) else None)
        if not body.get("exact", True):
            # serving-side mergeable sketch: DDSketch with the
            # reference's default alpha=0.01 (metric/percentiles.rs:
            # 216-218) — single-process is the trivial merge case of
            # the same partials `percentiles_ddsketch` distributes.
            # Same relative-error guarantee; NOT value-identical to
            # the distributed engine's `percentile_approx` (Spark's
            # GK sketch) — both carry explicit bounds (the
            # agg_percentiles_ddsketch tolerance-contract stance).
            from tantivy_spark.functions.ddsketch import DDSketch

            s = DDSketch(alpha=body.get("alpha", 0.01))
            if vals is not None:
                s.add(vals)
            return {
                f"{name}_p{str(p).replace('.', '_')}":
                    (float(s.quantile(p / 100.0)) if s.count else np.nan)
                for p in pcts
            }
        out = {}
        for p in pcts:
            col = f"{name}_p{str(p).replace('.', '_')}"
            # Spark's exact F.percentile interpolates linearly at rank
            # p*(n-1) — numpy's "linear" method is the same formula
            out[col] = (float(np.percentile(vals, p, method="linear"))
                        if vals is not None else np.nan)
        return out
    if kind == "cardinality":
        if body.get("exact", False):
            return {name: np.int64(nn.nunique())}
        # serving-side mergeable HLL (functions/hll.py): same register
        # count as the distributed HLL++ (rsd -> lg_k, default 0.023 ->
        # lg_k=11 = the reference's DataSketches default) and the same
        # error class; estimates are NOT bit-identical to Spark's
        # HLL++ (different hash/bias constants — the documented
        # agg_cardinality_hll tolerance-contract stance).
        from tantivy_spark.functions.hll import HyperLogLog, lg_k_for_rsd

        h = HyperLogLog(lg_k_for_rsd(body.get("rsd", 0.023)))
        if nn is not None and len(nn):
            h.add(nn)
        return {name: np.int64(round(h.estimate()))}
    raise ValueError(f"unsupported metric aggregation {kind!r}")


def _metric_cols(sub_aggs: dict | None) -> list[str]:
    cols: list[str] = []
    for name, spec in (sub_aggs or {}).items():
        cols.extend(metric_colnames(name, spec))
    return cols


def _agg_groups(pdf: pd.DataFrame, keys: dict[str, pd.Series],
                sub_aggs: dict | None) -> pd.DataFrame:
    """groupBy(keys).agg(doc_count + metrics) — null keys form a bucket,
    exactly like Spark's groupBy."""
    names = list(keys)
    tmp = [f"__gk{i}" for i in range(len(names))]
    work = pdf.assign(**dict(zip(tmp, keys.values())))
    cols = names + ["doc_count"] + _metric_cols(sub_aggs)
    if not len(work):
        return pd.DataFrame(columns=cols)
    rows = []
    for kv, sub in work.groupby(tmp, dropna=False, sort=False):
        if not isinstance(kv, tuple):
            kv = (kv,)
        row = dict(zip(names, kv))
        row["doc_count"] = np.int64(len(sub))
        for name, spec in (sub_aggs or {}).items():
            row.update(_metric_values(sub, name, spec))
        rows.append(row)
    return pd.DataFrame(rows, columns=cols)


def _agg_global(pdf: pd.DataFrame, sub_aggs: dict | None) -> pd.DataFrame:
    row = {"doc_count": np.int64(len(pdf))}
    for name, spec in (sub_aggs or {}).items():
        row.update(_metric_values(pdf, name, spec))
    return pd.DataFrame([row], columns=["doc_count"] + _metric_cols(sub_aggs))


def _sort(df: pd.DataFrame, keys: list[tuple[str, bool]]) -> pd.DataFrame:
    """Lexicographic multi-key sort with Spark's null placement (nulls
    are smallest: first when ascending, last when descending) — pandas'
    na_position is global per call, so sort stably key-by-key."""
    for col, asc in reversed(keys):
        df = df.sort_values(col, ascending=asc, kind="stable",
                            na_position="first" if asc else "last")
    return df.reset_index(drop=True)


# --------------------------------------------------------------------------
# bucket aggregations (mirrors of the Catalyst builders)
# --------------------------------------------------------------------------


def _terms(pdf: pd.DataFrame, body: dict,
           sub_aggs: dict | None) -> pd.DataFrame:
    if body.get("shard_size") is not None:
        raise NotImplementedError(
            "shard_size is the distributed shard-merge protocol; a "
            "single-process reader is exact (error bound 0)")
    field = body["field"]
    size = body.get("size", 10)
    order_by = body.get("order", "count")
    key = pdf[field]
    if body.get("missing") is not None:
        key = key.fillna(body["missing"])
    max_buckets = body.get("max_buckets")
    if max_buckets is not None and key.nunique(dropna=False) > max_buckets:
        raise AggregationLimitError(
            f"aggregation would create > {max_buckets} buckets "
            f"(reference DEFAULT_BUCKET_LIMIT={DEFAULT_BUCKET_LIMIT})")
    g = _agg_groups(pdf, {"key": key}, sub_aggs)
    min_doc_count = body.get("min_doc_count", 1)
    if min_doc_count > 1:
        g = g[g["doc_count"] >= min_doc_count]
    if body.get("show_doc_count_error"):
        g = g.assign(doc_count_error_upper_bound=np.int64(0))
    if isinstance(order_by, dict):
        (target, direction), = order_by.items()
    elif order_by == "count":
        target, direction = "_count", "desc"
    else:
        target, direction = "_key", "asc"
    col = {"_count": "doc_count", "_key": "key"}.get(target, target)
    out = _sort(g, [(col, direction == "asc"), ("key", True)]).head(size)
    if body.get("show_sum_other"):
        total = int(key.notna().sum())
        out = out.assign(sum_other_doc_count=np.int64(
            total - int(out["doc_count"].sum())))
    return out.reset_index(drop=True)


def _histogram_over(pdf: pd.DataFrame, key: pd.Series, body: dict,
                    sub_aggs: dict | None) -> pd.DataFrame:
    """Shared histogram core over a precomputed float bucket key —
    reference gap-fill / bounds semantics (histogram.rs:60,137-183)."""
    interval = float(body["interval"])
    offset = float(body.get("offset", 0.0))
    min_doc_count = body.get("min_doc_count", 0)
    eb = body.get("extended_bounds")
    hb = body.get("hard_bounds")
    eb = (eb["min"], eb["max"]) if isinstance(eb, dict) else eb
    hb = (hb["min"], hb["max"]) if isinstance(hb, dict) else hb
    max_buckets = body.get("max_buckets", DEFAULT_BUCKET_LIMIT)
    if min_doc_count > 0 and eb is not None:
        raise ValueError(
            "Cannot set min_doc_count and extended_bounds at the same time")
    if hb is not None:
        lo, hi = hb
        if eb is not None and (eb[0] < lo or eb[1] > hi):
            raise ValueError("extended_bounds have to be inside hard_bounds")
        keep = (key >= lo) & (key <= hi)
        pdf, key = pdf[keep], key[keep]
    g = _agg_groups(pdf, {"key": key}, sub_aggs)
    if min_doc_count > 0:
        return _sort(g[g["doc_count"] >= min_doc_count], [("key", True)])
    nn = g["key"].dropna()
    if not len(nn):
        return _sort(g, [("key", True)])
    lo, hi = float(nn.min()), float(nn.max())
    if eb is not None:
        lo = min(lo, math.floor((eb[0] - offset) / interval)
                 * interval + offset)
        hi = max(hi, float(eb[1]))
        hi = (hi - offset) // interval * interval + offset
    n = int(round((hi - lo) / interval)) + 1
    if max_buckets is not None and n > max_buckets:
        raise AggregationLimitError(
            f"aggregation would create > {max_buckets} buckets "
            f"(reference DEFAULT_BUCKET_LIMIT={DEFAULT_BUCKET_LIMIT})")
    grid = pd.DataFrame({"key": lo + np.arange(n) * interval})
    filled = grid.merge(g, on="key", how="left")
    filled["doc_count"] = filled["doc_count"].fillna(0).astype("int64")
    return _sort(filled, [("key", True)])


def _histogram(pdf: pd.DataFrame, body: dict,
               sub_aggs: dict | None) -> pd.DataFrame:
    v = pdf[body["field"]].astype("float64")
    interval = float(body["interval"])
    offset = float(body.get("offset", 0.0))
    key = np.floor((v - offset) / interval) * interval + offset
    return _histogram_over(pdf, key, body, sub_aggs)


def _epoch_ms(ts: pd.Series) -> pd.Series:
    """unix_millis as float64 with NaN for nulls — int64 ns first (ns
    overflows float64's integer range; ms does not)."""
    ts = pd.to_datetime(ts)
    if isinstance(ts.dtype, pd.DatetimeTZDtype):
        ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
    # normalize the storage unit (parquet round-trips give [us]) — a raw
    # int64 view is ns/us/s depending on dtype
    msi = ts.astype("datetime64[ns]").astype("int64") // 10**6
    return pd.Series(msi, index=ts.index).where(ts.notna()).astype("float64")


def _date_trunc(ts: pd.Series, unit: str) -> pd.Series:
    ts = pd.to_datetime(ts)
    if isinstance(ts.dtype, pd.DatetimeTZDtype):
        ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
    u = unit.lower()
    if u == "minute":
        return ts.dt.floor("min")
    if u == "hour":
        return ts.dt.floor("h")
    if u == "day":
        return ts.dt.floor("D")
    if u == "week":  # Spark date_trunc('week') truncates to Monday
        d = ts.dt.floor("D")
        return d - pd.to_timedelta(d.dt.weekday, unit="D")
    if u == "month":
        return ts.dt.to_period("M").dt.to_timestamp()
    if u == "quarter":
        return ts.dt.to_period("Q").dt.to_timestamp()
    if u == "year":
        return ts.dt.to_period("Y").dt.to_timestamp()
    raise ValueError(f"unsupported date_trunc unit {unit!r}")


def _date_histogram(pdf: pd.DataFrame, body: dict,
                    sub_aggs: dict | None) -> pd.DataFrame:
    field = body["field"]
    if "fixed_interval" in body:
        iv = parse_fixed_interval_ms(body["fixed_interval"])
        off = (parse_fixed_interval_ms(body["offset"])
               if body.get("offset") else 0)
        ms = _epoch_ms(pdf[field])
        key = np.floor((ms - float(off)) / float(iv)) * float(iv) + float(off)
        out = _histogram_over(
            pdf, key,
            {"interval": float(iv), "offset": float(off),
             "min_doc_count": body.get("min_doc_count", 0),
             "max_buckets": body.get("max_buckets", DEFAULT_BUCKET_LIMIT)},
            sub_aggs)
        out = out.copy()
        out["key"] = pd.to_datetime(out["key"], unit="ms")
        return out
    interval = body.get("calendar_interval", body.get("interval", "day"))
    key = _date_trunc(pdf[field], interval)
    return _sort(_agg_groups(pdf, {"key": key}, sub_aggs), [("key", True)])


def _range_key(c: pd.Series, ranges: list[dict],
               default_label: bool) -> pd.Series:
    """First-matching half-open [from, to) range label per row — the
    reversed when/otherwise chain of range_agg (bucket/range.rs)."""
    key = pd.Series([None] * len(c), dtype=object, index=c.index)
    assigned = pd.Series(False, index=c.index)
    for r in ranges:
        cond = pd.Series(True, index=c.index)
        if r.get("from") is not None:
            cond &= (c >= r["from"]).fillna(False)
        if r.get("to") is not None:
            cond &= (c < r["to"]).fillna(False)
        cond &= ~assigned
        if default_label:
            lo, hi = r.get("from", "*"), r.get("to", "*")
            label = r.get("key", f"{lo}-{hi}")
        else:
            label = r.get("key")
        key[cond] = label
        assigned |= cond
    return key


def _range(pdf: pd.DataFrame, body: dict,
           sub_aggs: dict | None) -> pd.DataFrame:
    key = _range_key(pdf[body["field"]], body["ranges"], default_label=True)
    sel = key.notna()
    return _sort(_agg_groups(pdf[sel], {"key": key[sel]}, sub_aggs),
                 [("key", True)])


def _filter(pdf: pd.DataFrame, body: dict,
            sub_aggs: dict | None) -> pd.DataFrame:
    cond = body["condition"]
    if callable(cond):
        mask = np.asarray(cond(pdf), dtype=bool)
    else:
        # the SHARED portable predicate (plans/predicate.py): same
        # dialect, same Spark-null (Kleene) semantics, same
        # PredicateError as the distributed filter_agg — pandas.eval
        # and its dialect-overlap trap are gone
        from tantivy_spark.plans import predicate as P

        mask = P.to_pandas_mask(P.as_ast(cond), pdf)
    return _agg_global(pdf[mask], sub_aggs)


def _composite_source(spec, pdf: pd.DataFrame):
    """(name, key series, direction, drop_missing) — pandas mirror of
    aggregations._composite_source."""
    if isinstance(spec, str):
        return spec, pdf[spec], "asc", False
    (name, inner), = spec.items()
    (kind, body), = inner.items()
    f = body["field"]
    if kind == "terms":
        key = pdf[f]
    elif kind == "histogram":
        iv = float(body["interval"])
        key = np.floor(pdf[f].astype("float64") / iv) * iv
    elif kind == "date_histogram":
        if "fixed_interval" in body:
            iv = float(parse_fixed_interval_ms(body["fixed_interval"]))
            ms = np.floor(_epoch_ms(pdf[f]) / iv) * iv
            key = pd.to_datetime(ms, unit="ms")
        else:
            key = _date_trunc(pdf[f],
                              body.get("calendar_interval", "day"))
    else:
        raise ValueError(f"unknown composite source kind {kind!r}")
    return (name, key, body.get("order", "asc"),
            not body.get("missing_bucket", False))


def _composite(pdf: pd.DataFrame, body: dict,
               sub_aggs: dict | None) -> pd.DataFrame:
    parsed = [_composite_source(s, pdf) for s in body["sources"]]
    keep = pd.Series(True, index=pdf.index)
    for _, key, _, drop_missing in parsed:
        if drop_missing:
            keep &= key.notna()
    keys = {n: key[keep] for n, key, _, _ in parsed}
    g = _agg_groups(pdf[keep], keys, sub_aggs)
    after = tuple(body["after"]) if body.get("after") else None
    if after is not None:
        pred = pd.Series(False, index=g.index)
        eq = pd.Series(True, index=g.index)
        for (n, _, order, _), a in zip(parsed, after):
            beyond = (g[n] > a) if order == "asc" else (g[n] < a)
            pred |= eq & beyond.fillna(False)
            eq &= (g[n] == a).fillna(False)
        g = g[pred]
    sort = [(n, order == "asc") for n, _, order, _ in parsed]
    return _sort(g, sort).head(body.get("size", 10)).reset_index(drop=True)


def _missing(pdf: pd.DataFrame, body: dict,
             sub_aggs: dict | None) -> pd.DataFrame:
    return _agg_global(pdf[pdf[body["field"]].isna()], sub_aggs)


def _top_hits(pdf: pd.DataFrame, body: dict) -> pd.DataFrame:
    group_field = body["group_field"]
    size = body.get("size", 3)
    sort_field = body["sort_field"]
    ascending = body.get("ascending", False)
    select = body.get("select")
    out_cols = select or list(pdf.columns)
    extra = [c for c in out_cols if c not in (sort_field, group_field)]
    order = [(sort_field, ascending)] + [(c, True) for c in extra]
    ranked = _sort(pdf, order)
    top = ranked.groupby(group_field, dropna=False, sort=False).head(size)
    return top[[group_field] +
               [c for c in out_cols if c != group_field]].reset_index(
                   drop=True)


def _bucket_key(kind: str, body: dict, pdf: pd.DataFrame):
    """(key series, post-filter) for nesting — mirror of
    aggregations._bucket_key."""
    if kind == "terms":
        key = pdf[body["field"]]
        if body.get("missing") is not None:
            key = key.fillna(body["missing"])
        return key
    if kind == "histogram":
        iv = float(body["interval"])
        return np.floor(pdf[body["field"]].astype("float64") / iv) * iv
    if kind == "date_histogram":
        interval = body.get("calendar_interval", body.get("interval", "day"))
        return _date_trunc(pdf[body["field"]], interval)
    if kind == "range":
        return _range_key(pdf[body["field"]], body["ranges"],
                          default_label=False)
    raise ValueError(f"bucket kind {kind!r} cannot nest")


def _nested(pdf: pd.DataFrame, pkind: str, pbody: dict,
            ckind: str, cbody: dict,
            metric_aggs: dict | None) -> pd.DataFrame:
    pk = _bucket_key(pkind, pbody, pdf)
    ck = _bucket_key(ckind, cbody, pdf)
    sel = pk.notna() & ck.notna()
    g = _agg_groups(pdf[sel], {"key": pk[sel], "child_key": ck[sel]},
                    metric_aggs)
    if pkind == "terms":
        size = pbody.get("size", 10)
        totals = (g.groupby("key", dropna=False, sort=False)["doc_count"]
                  .sum().reset_index(name="_total"))
        top = _sort(totals, [("_total", False), ("key", True)]).head(size)
        g = g[g["key"].isin(set(top["key"]))]
    return _sort(g, [("key", True), ("child_key", True)])


# --------------------------------------------------------------------------
# dispatcher — mirror of aggregations.run_aggregation
# --------------------------------------------------------------------------

def run_aggregation_pandas(pdf: pd.DataFrame, request: dict) -> pd.DataFrame:
    """Execute one named ES-shaped aggregation request over an in-memory
    frame — same request dialect, output columns, and ordering as
    `aggregations.run_aggregation` (see module docstring for the three
    documented divergences)."""
    sub = request.get("aggs")
    kinds = [k for k in request if k != "aggs"]
    if sub and len(kinds) == 1:
        bucket_children = {
            n: s for n, s in sub.items()
            if next(iter(s.keys() - {"aggs"})) in
            ("terms", "histogram", "date_histogram", "range")
        }
        if bucket_children:
            if len(bucket_children) > 1:
                raise ValueError("one nested bucket per level")
            (cname, cspec), = bucket_children.items()
            ckind = next(iter(cspec.keys() - {"aggs"}))
            return _nested(pdf, kinds[0], request[kinds[0]],
                           ckind, cspec[ckind], cspec.get("aggs"))
    if len(kinds) != 1:
        raise ValueError("request must contain exactly one aggregation kind")
    kind = kinds[0]
    body = request[kind]
    if kind == "terms":
        return _terms(pdf, body, sub)
    if kind == "histogram":
        return _histogram(pdf, body, sub)
    if kind == "date_histogram":
        return _date_histogram(pdf, body, sub)
    if kind == "range":
        return _range(pdf, body, sub)
    if kind == "filter":
        return _filter(pdf, body, sub)
    if kind == "composite":
        return _composite(pdf, body, sub)
    if kind == "missing":
        return _missing(pdf, body, sub)
    if kind == "top_hits":
        return _top_hits(pdf, body)
    # bucketless metric at the root
    return _agg_global(pdf, {kind: {kind: body}})

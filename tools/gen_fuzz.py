"""Randomized hostile-VALUE corpus generator — fuzz the data, not the SQL.

Round-9 brief item 4: both sf1-only bugs of round 7 (decimal-sum
rounding boundary, -0.0) were VALUE-DISTRIBUTION artifacts the
fixed-seed generators missed until scale. This tool generates a full
10-table corpus at sf0.001-ish size whose value distributions are drawn
fresh per seed, so the cross-engine normalizer (tools/check_oracle.py)
can sweep the whole contract over many corpora cheaply. Planted classes,
all randomized per seed:

- NULL densities: each nullable measure/category column draws its own
  density from U(0, 0.4); foreign keys from U(0, 0.05) (dangling + NULL
  join keys); primary keys never NULL.
- float extremes: -0.0, +0.0, denormals (5e-324, 1e-308), large-but-
  sum-safe magnitudes (1e12), negatives, and two-decimal BOUNDARY money
  values (x.xx5 — the exact HALF_UP/binary-round divergence class;
  oracle queries must not round per-row, and this corpus enforces it).
- duplicate-heavy keys: order/part/supp keys drawn Zipf-ish so a few
  keys own a large share of lineitems; duplicate (user_id, ts) event
  pairs exercise window tie-break determinism (entries must order by a
  unique column).
- empty groups: categorical domains are random SUBSETS of a superset
  (e.g. l_returnflag from {N,R,A,X,Z}) with skewed weights, so some
  group values are rare or absent per seed.
- string hostility: empty strings, whitespace-only, unicode (CJK,
  emoji, combining marks), embedded quotes/newlines/pipes, 2 kB
  outliers.
- documents: planted exact-duplicate and near-duplicate (one-token
  edit) clusters at random sizes, plus unicode/empty/whitespace texts;
  n_chars stays consistent with text (NULL text -> NULL n_chars).
- embeddings: gaussian vectors with planted exact-duplicate vectors,
  a dense near-dup cluster, and denormal/large components. Never the
  all-zero vector (zero-norm is a DOCUMENTED loud failure in PCA, not
  a divergence).

Deliberately NOT planted (documented engine-capability differences,
not Spark defects — each would fail the ORACLE side):
- malformed JSON in events.props (duckdb json_extract errors on it;
  Spark get_json_object returns NULL) — props is valid JSON or NULL;
  values stay scalar so neither engine's re-serialization differs.
- NaN / +-Inf measures (cross-engine ordering and re-serialization of
  non-finite floats is unspecified in the reference's SQL surface).

Schemas match /root/testdata/sf* exactly (same column names, arrow
types). Row counts sit near sf0.001 so a full contract sweep costs the
same as the driver's smallest tier.

Deterministic per (seed): numpy Generator seeded from (seed, table).

Usage: python tools/gen_fuzz.py <out_dir> [seed]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES_REF = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = 25
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
RETURNFLAGS = ["N", "R", "A", "X", "Z"]
LINESTATUSES = ["O", "F"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error", "refund"]
LANGS = ["en", "de", "fr", "zh", "es", "und"]
SOURCES = ["web", "crawl", "wiki", "books", "code"]

HOSTILE_STRINGS = [
    "",
    " ",
    "  \t ",
    "héllo wörld",
    "北京测试文本",
    "emoji \U0001f680\U0001f9ea end",
    "a|b|c|d",
    'quote " and \' mix',
    "line\nbreak\r\ntext",
    "combining é mark",
    "x" * 2048,
]

WORDS = (
    "the quick brown fox jumps over lazy dog data table scan merge sort "
    "hash join window batch stream key value shard block page cache disk "
    "spill probe build filter map reduce fold count group order limit"
).split()


def _rng(seed: int, table: str) -> np.random.Generator:
    # zlib.crc32, not hash(): Python string hashing is salted per
    # process (PYTHONHASHSEED), which would silently break corpus
    # reproducibility across runs
    import zlib

    return np.random.default_rng(
        np.random.SeedSequence([seed, zlib.crc32(table.encode())])
    )


def _money(rng, n):
    """Two-decimal money values with a planted boundary-.xx5 share and
    sign/denormal/magnitude extremes."""
    base = np.round(rng.uniform(-1000, 100000, n), 2)
    out = base.astype("float64")
    m = rng.random(n)
    # exact two-decimal boundary values like 123.45 are already there;
    # plant .xx5 three-decimal boundaries (pre-round inputs)
    b = m < 0.10
    out[b] = np.floor(np.abs(out[b])) + rng.integers(0, 100, int(b.sum())) / 100.0 + 0.005
    # large magnitudes are CAPPED at 1e6: beyond ~1e9 a double SUM's
    # accumulation-order ulps become visible at the normalizer's fixed
    # 6dp — re-proving float non-associativity, not engine semantics
    # (q01-style decimal accumulation covers the money-sum class; means
    # stay double and need the cap)
    out[m >= 0.995] = 1e6
    tiny = (m >= 0.985) & (m < 0.995)
    out[tiny] = rng.choice([5e-324, 1e-308, -5e-324, 0.0, -0.0], int(tiny.sum()))
    return out


def _with_nulls(rng, values: list, p: float) -> list:
    mask = rng.random(len(values)) < p
    return [None if m else v for v, m in zip(values, mask)]


def _strings(rng, n, pool, p_hostile=0.08):
    out = []
    for _ in range(n):
        if rng.random() < p_hostile:
            out.append(HOSTILE_STRINGS[int(rng.integers(0, len(HOSTILE_STRINGS)))])
        else:
            out.append(str(pool[int(rng.integers(0, len(pool)))]))
    return out


def _cat(rng, n, domain):
    """Random SUBSET of the domain with skewed weights → rare and
    absent categories per seed (the empty-group class)."""
    k = int(rng.integers(1, len(domain) + 1))
    picked = list(rng.choice(domain, size=k, replace=False))
    w = rng.dirichlet(np.ones(k) * 0.5)
    return [picked[i] for i in rng.choice(k, size=n, p=w)]


def _ts(rng, n, lo="1971-01-03", hi="2095-12-30", tie_share=0.1):
    lo_us = np.datetime64(lo, "us").astype("int64")
    hi_us = np.datetime64(hi, "us").astype("int64")
    t = rng.integers(lo_us, hi_us, n)
    # exact-duplicate timestamps (window tie-break stress)
    n_tie = int(n * tie_share)
    if n_tie > 1:
        idx = rng.choice(n, size=n_tie, replace=False)
        t[idx] = t[idx[0]]
    return t.astype("datetime64[us]")


def gen_corpus(out_dir: str, seed: int) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    counts = {}

    # ---- region / nation (fixed-size dims, fuzzed names) ----
    rng = _rng(seed, "region")
    region = pa.table(
        {
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": pa.array(_strings(rng, 5, REGIONS, p_hostile=0.2), pa.string()),
        }
    )
    rng = _rng(seed, "nation")
    nation = pa.table(
        {
            "n_nationkey": pa.array(range(NATIONS), pa.int32()),
            "n_name": pa.array(
                [f"NATION_{i}_{WORDS[i % len(WORDS)]}" for i in range(NATIONS)],
                pa.string(),
            ),
            "n_regionkey": pa.array(
                [int(x) for x in rng.integers(0, 5, NATIONS)], pa.int32()
            ),
        }
    )

    # ---- customer ----
    rng = _rng(seed, "customer")
    n_cust = int(rng.integers(100, 220))
    cust_keys = list(range(1, n_cust + 1))
    customer = pa.table(
        {
            "c_custkey": pa.array(cust_keys, pa.int64()),
            "c_name": pa.array(
                _with_nulls(
                    rng,
                    [f"Customer#{k:09d}" for k in cust_keys],
                    rng.uniform(0, 0.2),
                ),
                pa.string(),
            ),
            "c_nationkey": pa.array(
                _with_nulls(
                    rng,
                    [
                        int(x)
                        for x in rng.integers(0, NATIONS + 3, n_cust)  # +3 dangling
                    ],
                    rng.uniform(0, 0.05),
                ),
                pa.int32(),
            ),
            "c_acctbal": pa.array(
                _with_nulls(rng, list(_money(rng, n_cust)), rng.uniform(0, 0.3)),
                pa.float64(),
            ),
            "c_mktsegment": pa.array(
                _with_nulls(rng, _cat(rng, n_cust, SEGMENTS), rng.uniform(0, 0.2)),
                pa.string(),
            ),
        }
    )

    # ---- supplier ----
    rng = _rng(seed, "supplier")
    n_supp = int(rng.integers(8, 25))
    supplier = pa.table(
        {
            "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
            "s_name": pa.array(
                [f"Supplier#{k:09d}" for k in range(1, n_supp + 1)], pa.string()
            ),
            "s_nationkey": pa.array(
                [int(x) for x in rng.integers(0, NATIONS, n_supp)], pa.int32()
            ),
            "s_acctbal": pa.array(
                _with_nulls(rng, list(_money(rng, n_supp)), rng.uniform(0, 0.3)),
                pa.float64(),
            ),
        }
    )

    # ---- part ----
    rng = _rng(seed, "part")
    n_part = int(rng.integers(120, 260))
    part = pa.table(
        {
            "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
            "p_name": pa.array(
                _strings(rng, n_part, [f"part {w}" for w in WORDS]), pa.string()
            ),
            "p_brand": pa.array(
                _cat(rng, n_part, [f"Brand#{i}" for i in range(1, 6)]), pa.string()
            ),
            "p_type": pa.array(
                _with_nulls(
                    rng,
                    _cat(rng, n_part, ["ECONOMY", "STANDARD", "PROMO", "LARGE"]),
                    rng.uniform(0, 0.2),
                ),
                pa.string(),
            ),
            "p_size": pa.array(
                _with_nulls(
                    rng,
                    [int(x) for x in rng.integers(1, 51, n_part)],
                    rng.uniform(0, 0.2),
                ),
                pa.int32(),
            ),
            "p_retailprice": pa.array(
                _with_nulls(rng, list(_money(rng, n_part)), rng.uniform(0, 0.2)),
                pa.float64(),
            ),
        }
    )

    # ---- orders (Zipf-heavy customer ownership; some dangling custkeys) ----
    rng = _rng(seed, "orders")
    n_ord = int(rng.integers(1000, 2200))
    zipf_w = 1.0 / np.arange(1, n_cust + 1, dtype="float64") ** rng.uniform(0.5, 1.5)
    zipf_w /= zipf_w.sum()
    o_cust = rng.choice(np.array(cust_keys), size=n_ord, p=zipf_w)
    dangle = rng.random(n_ord) < 0.03
    o_cust = np.where(dangle, o_cust + n_cust + 50, o_cust)
    orders = pa.table(
        {
            "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
            "o_custkey": pa.array(
                _with_nulls(rng, [int(x) for x in o_cust], rng.uniform(0, 0.05)),
                pa.int64(),
            ),
            "o_orderstatus": pa.array(_cat(rng, n_ord, STATUSES), pa.string()),
            "o_totalprice": pa.array(
                _with_nulls(rng, list(_money(rng, n_ord)), rng.uniform(0, 0.3)),
                pa.float64(),
            ),
            "o_orderdate": pa.array(_ts(rng, n_ord), pa.timestamp("us")),
            "o_orderpriority": pa.array(
                _with_nulls(rng, _cat(rng, n_ord, PRIORITIES), rng.uniform(0, 0.2)),
                pa.string(),
            ),
        }
    )

    # ---- lineitem (duplicate-heavy l_orderkey; full measure fuzz) ----
    rng = _rng(seed, "lineitem")
    n_li = int(rng.integers(4000, 8000))
    li_ord = rng.choice(np.arange(1, n_ord + 1), size=n_li)
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([int(x) for x in li_ord], pa.int64()),
            "l_partkey": pa.array(
                [int(x) for x in rng.integers(1, n_part + 5, n_li)], pa.int64()
            ),
            "l_suppkey": pa.array(
                [int(x) for x in rng.integers(1, n_supp + 2, n_li)], pa.int64()
            ),
            "l_linenumber": pa.array(
                [int(x) for x in rng.integers(1, 8, n_li)], pa.int32()
            ),
            "l_quantity": pa.array(
                _with_nulls(
                    rng,
                    [float(x) for x in rng.integers(1, 51, n_li)],
                    rng.uniform(0, 0.25),
                ),
                pa.float64(),
            ),
            "l_extendedprice": pa.array(
                _with_nulls(rng, list(_money(rng, n_li)), rng.uniform(0, 0.25)),
                pa.float64(),
            ),
            "l_discount": pa.array(
                _with_nulls(
                    rng,
                    list(np.round(rng.uniform(0, 0.1, n_li), 3)),
                    rng.uniform(0, 0.25),
                ),
                pa.float64(),
            ),
            "l_tax": pa.array(
                _with_nulls(
                    rng,
                    list(np.round(rng.uniform(0, 0.08, n_li), 3)),
                    rng.uniform(0, 0.25),
                ),
                pa.float64(),
            ),
            "l_returnflag": pa.array(
                _with_nulls(rng, _cat(rng, n_li, RETURNFLAGS), rng.uniform(0, 0.1)),
                pa.string(),
            ),
            "l_linestatus": pa.array(_cat(rng, n_li, LINESTATUSES), pa.string()),
            "l_shipdate": pa.array(_ts(rng, n_li), pa.timestamp("us")),
        }
    )

    # ---- events (duplicate (user_id, ts) pairs; valid-JSON-or-NULL props) ----
    rng = _rng(seed, "events")
    n_ev = int(rng.integers(700, 1500))
    n_users = int(rng.integers(3, 40))
    props = []
    for _ in range(n_ev):
        r = rng.random()
        if r < 0.15:
            props.append(None)
        elif r < 0.30:
            props.append("{}")  # missing $.k
        elif r < 0.45:
            props.append(json.dumps({"k": WORDS[int(rng.integers(0, len(WORDS)))]}))
        elif r < 0.55:
            props.append(json.dumps({"k": None}))
        elif r < 0.65:
            props.append(json.dumps({"k": bool(rng.random() < 0.5)}))
        else:
            props.append(json.dumps({"k": int(rng.integers(-1000, 1000))}))
    events = pa.table(
        {
            "event_id": pa.array(range(n_ev), pa.int64()),
            "ts": pa.array(_ts(rng, n_ev, tie_share=0.25), pa.timestamp("us")),
            "user_id": pa.array(
                [int(x) for x in rng.integers(0, n_users, n_ev)], pa.int64()
            ),
            "event_type": pa.array(
                _with_nulls(rng, _cat(rng, n_ev, EVENT_TYPES), rng.uniform(0, 0.1)),
                pa.string(),
            ),
            "value": pa.array(
                _with_nulls(rng, list(_money(rng, n_ev)), rng.uniform(0, 0.3)),
                pa.float64(),
            ),
            "props": pa.array(props, pa.string()),
        }
    )

    # ---- documents (planted dup/near-dup clusters + hostile strings) ----
    rng = _rng(seed, "documents")
    n_doc = int(rng.integers(300, 600))
    texts: list[str | None] = []
    base_docs = [
        " ".join(WORDS[int(rng.integers(0, len(WORDS)))] for _ in range(int(rng.integers(20, 120))))
        for _ in range(max(1, n_doc // 4))
    ]
    i = 0
    while len(texts) < n_doc:
        r = rng.random()
        if r < 0.08:
            texts.append(HOSTILE_STRINGS[int(rng.integers(0, len(HOSTILE_STRINGS)))])
        elif r < 0.20 and texts:
            texts.append(texts[int(rng.integers(0, len(texts)))])  # exact dup
        elif r < 0.32:
            # near dup: one-token edit of a base doc
            toks = base_docs[int(rng.integers(0, len(base_docs)))].split()
            if toks:
                toks[int(rng.integers(0, len(toks)))] = f"edit{i}"
            texts.append(" ".join(toks))
        else:
            texts.append(base_docs[int(rng.integers(0, len(base_docs)))] + f" tail{i}")
        i += 1
    texts = _with_nulls(rng, texts, rng.uniform(0, 0.05))
    documents = pa.table(
        {
            "doc_id": pa.array(range(n_doc), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                _with_nulls(rng, _cat(rng, n_doc, LANGS), rng.uniform(0, 0.15)),
                pa.string(),
            ),
            "source": pa.array(_cat(rng, n_doc, SOURCES), pa.string()),
            "n_chars": pa.array(
                [None if t is None else len(t) for t in texts], pa.int64()
            ),
        }
    )

    # ---- embeddings (dup vectors, dense cluster, denormal/large comps) ----
    rng = _rng(seed, "embeddings")
    n_vec = int(rng.integers(300, 600))
    dim = 64
    vecs = rng.normal(0, 1, (n_vec, dim)).astype("float32")
    n_dup = int(rng.integers(5, 40))
    vecs[1 : 1 + n_dup] = vecs[0]  # exact-duplicate block
    n_clu = int(rng.integers(10, 50))
    center = rng.normal(0, 1, dim).astype("float32")
    vecs[1 + n_dup : 1 + n_dup + n_clu] = center + rng.normal(
        0, 0.01, (n_clu, dim)
    ).astype("float32")
    # denormal / large components in a few rows (never all-zero rows).
    # Large is capped at 1e4: the quantized-signature entries multiply
    # components by ~1e4 and cast to BIGINT — a 1e20 component overflows
    # int64 in BOTH engines (an ANSI error, not a divergence)
    for ridx in rng.choice(n_vec, size=5, replace=False):
        vecs[ridx, 0] = np.float32(1e-40)
        vecs[ridx, 1] = np.float32(1e4)
    embeddings = pa.table(
        {
            "vec_id": pa.array(range(n_vec), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(
                [int(x) for x in rng.integers(0, 10, n_vec)], pa.int32()
            ),
        }
    )

    for name, tbl in [
        ("region", region), ("nation", nation), ("customer", customer),
        ("supplier", supplier), ("part", part), ("orders", orders),
        ("lineitem", lineitem), ("events", events), ("documents", documents),
        ("embeddings", embeddings),
    ]:
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
        counts[name] = tbl.num_rows
    return counts


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    out_dir = sys.argv[1]
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    counts = gen_corpus(out_dir, seed)
    print(json.dumps({"out_dir": out_dir, "seed": seed, "rows": counts}))


if __name__ == "__main__":
    main()

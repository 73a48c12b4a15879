"""DuckDB oracles for the xxhash64 production dedup entries, assembled
from the staged-CTE XXH64 generator (ext/xxoracle.py) — these upgrade
dedup_simhash / dedup_minhash / dedup_ngram_jaccard from rows-only to
full value-checked entries.

Structure (all relational, no deep expression nesting — see
xxoracle.py's binder note): documents explode to a (doc_id, tok) long
format, token hashes run through the staged word/byte/avalanche CTEs,
and everything downstream (votes, shingle chains, permutations,
banding, pair expansion) mirrors the Spark operators' arithmetic
column for column.
"""

from __future__ import annotations

from bq_duckdb_spark.ext import xxoracle as xo

_W = xo._W


def _tok_hash_ctes(chain_name: str = "tok") -> xo.StageChain:
    """(doc_id, tok) exploded + staged XXH64 -> column ``th`` (signed
    BIGINT via signed() at use sites; carried unsigned as ``th_u``)."""
    base = (
        "SELECT doc_id, u.t AS tok "
        "FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr "
        "FROM documents), unnest(arr) AS u(t)"
    )
    ch = xo.StageChain(chain_name, base, ["doc_id", "tok"])
    xo.add_hash_string_stages(ch, "tok", "th_u")
    ch.stage({"th": xo.signed("th_u")}, drop=["tok", "th_u"])
    return ch


def simhash_oracle(
    max_hamming: int = 3, max_bucket: int = 1000, n_blocks: int = 6
) -> str:
    """dedup_simhash: 64-bit vote fingerprint over token xxhash64s,
    multi-block pigeonhole banding, first-clean-band emission — the
    Spark operator's exact arithmetic (ext/dedup.py
    simhash_near_dup_pairs), with the band keys, cap, and emit-once
    lookup generated from the SAME layout/combo builders."""
    from bq_duckdb_spark.ext.dedup import (
        band_combos,
        band_key_exprs,
        block_layout,
        clean_bitmap_expr,
        first_band_lookup,
    )

    ch = _tok_hash_ctes()
    bits = " + ".join(
        f"CASE WHEN 2 * sum((th >> {b}) & 1) > count(*) "
        f"THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END"
        for b in range(64)
    )
    layout = block_layout(64, n_blocks)
    combos = band_combos(n_blocks, max_hamming)
    keys = ", ".join(band_key_exprs("simhash", layout, combos))
    lookup = ", ".join(map(str, first_band_lookup(combos, n_blocks)))
    bm = clean_bitmap_expr("x", layout)
    return f"""
WITH {ch.render_ctes()},
fp AS MATERIALIZED (
    SELECT doc_id, {xo.signed(f"({bits})")} AS simhash
    FROM {ch.cur} GROUP BY doc_id
),
banded AS MATERIALIZED (
    SELECT doc_id, simhash, u.band, keys[u.band + 1] AS key
    FROM (SELECT doc_id, simhash, [{keys}] AS keys FROM fp),
         unnest(range(0, {len(combos)})) AS u(band)
    QUALIFY row_number() OVER (PARTITION BY u.band, keys[u.band + 1]
        ORDER BY doc_id) <= {max_bucket}
),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.band,
           xor(a.simhash, b.simhash) AS x
    FROM banded a JOIN banded b USING (band, key)
    WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(x) AS hamming
FROM pairs
WHERE bit_count(x) <= {max_hamming}
  AND band = ([{lookup}])[({bm}) + 1]
"""


def _minhash_ctes(
    num_hashes: int = 32, bands: int = 16, shingle_k: int = 3,
    max_bucket: int = 1000,
) -> tuple[str, str]:
    """Shared CTE chain: token hashes -> shingle ids -> signature ->
    band buckets -> DISTINCT candidate pairs. Returns (ctes_sql,
    final_ctes) where the chain exposes ``sh_set(doc_id, shingle)``,
    ``cand(id_a, id_b)``."""
    from bq_duckdb_spark.ext.dedup import _minhash_coeffs

    assert shingle_k == 3, "oracle generated for the k=3 production default"
    base = (
        "SELECT doc_id, CAST(u.i AS INT) AS pos, "
        "arr[CAST(u.i AS INT)] AS tok, len(arr) AS n "
        "FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr "
        "FROM documents), unnest(range(1, len(arr) + 1)) AS u(i)"
    )
    ch = xo.StageChain("mtok", base, ["doc_id", "pos", "tok", "n"])
    xo.add_hash_string_stages(ch, "tok", "th_u")
    ch.stage({"th": xo.signed("th_u")}, drop=["tok", "th_u"])
    lead_cte = f"""
mlead AS MATERIALIZED (
    SELECT doc_id, pos, n, th,
           lead(th, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS th2,
           lead(th, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS th3
    FROM {ch.cur}
    QUALIFY (n >= 3 AND pos <= n - 2) OR (n < 3 AND pos = 1)
)"""
    sh = xo.StageChain(
        "msh", "SELECT doc_id, n, th, th2, th3 FROM mlead",
        ["doc_id", "n", "th", "th2", "th3"],
    )
    xo.add_hash_long_stages(sh, "th", f"CAST({xo.SEED} AS HUGEINT)", "c1")
    xo.add_hash_long_stages(sh, "th2", "c1", "c2")
    xo.add_hash_long_stages(sh, "th3", "c2", "c3")
    sh.stage(
        {"shingle": "CASE WHEN n >= 3 THEN " + xo.signed("c3")
                    + " WHEN n = 2 THEN " + xo.signed("c2")
                    + " ELSE " + xo.signed("c1") + " END"},
        drop=["th", "th2", "th3", "c1", "c2", "c3", "n"],
    )
    a, b = _minhash_coeffs(num_hashes)
    # sig_j = min over shingles of (a_j * h + b_j) mod 2^64, unsigned
    sig_cols = ", ".join(
        f"min(({xo._mm(xo.unsigned('shingle'), str(a[j]))} + {b[j]}) % {_W}::HUGEINT) AS sg{j}"
        for j in range(num_hashes)
    )
    rows = num_hashes // bands
    bd = xo.StageChain(
        "mband",
        f"SELECT doc_id, {sig_cols} FROM sh_set GROUP BY doc_id",
        ["doc_id"] + [f"sg{j}" for j in range(num_hashes)],
    )
    # band bucket = Spark xxhash64(sig[b*rows+1], ..., sig[(b+1)*rows]):
    # chained hashLong over the SIGNED signature values
    cur_seeds = {bi: f"CAST({xo.SEED} AS HUGEINT)" for bi in range(bands)}
    for r in range(rows):
        triples = []
        dead = []
        for bi in range(bands):
            j = bi * rows + r
            out = f"bk{bi}_{r}"
            triples.append((xo.signed(f"sg{j}"), cur_seeds[bi], out))
            dead.append(f"sg{j}")
            if r:
                dead.append(cur_seeds[bi])
            cur_seeds[bi] = out
        xo.add_hash_long_stages_multi(bd, triples)
        bd.stage({}, drop=dead)  # prune consumed signatures/stale seeds
    bucket_union = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, "
        f"{xo.signed(f'bk{bi}_{rows - 1}')} AS bucket FROM {bd.cur}"
        for bi in range(bands)
    )
    ctes = f"""{ch.render_ctes()},
{lead_cte.strip()},
{sh.render_ctes()},
sh_set AS MATERIALIZED (SELECT DISTINCT doc_id, shingle FROM {sh.cur}),
{bd.render_ctes()},
banded AS MATERIALIZED (
    SELECT doc_id, band, bucket FROM ({bucket_union})
    QUALIFY row_number() OVER (PARTITION BY band, bucket
                               ORDER BY doc_id) <= {max_bucket}
),
cand AS MATERIALIZED (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b USING (band, bucket)
    WHERE a.doc_id < b.doc_id
)"""
    return ctes, "cand"


def minhash_oracle() -> str:
    """dedup_minhash: DISTINCT banded candidate pairs."""
    ctes, final = _minhash_ctes()
    return f"WITH {ctes}\nSELECT id_a, id_b FROM {final}"


def jaccard_oracle(threshold: float = 0.3) -> str:
    """dedup_ngram_jaccard: exact shingle-set Jaccard over the banded
    candidates (the verify join of ext/dedup.py ngram_jaccard_pairs).
    The division is exact-int / exact-int in both engines — identical
    doubles, no rounding."""
    ctes, final = _minhash_ctes()
    return f"""WITH {ctes},
cnts AS MATERIALIZED (SELECT doc_id, count(*) AS c FROM sh_set GROUP BY doc_id),
inter AS MATERIALIZED (
    SELECT p.id_a, p.id_b, count(*) AS i
    FROM {final} p
    JOIN sh_set a ON a.doc_id = p.id_a
    JOIN sh_set b ON b.doc_id = p.id_b AND b.shingle = a.shingle
    GROUP BY p.id_a, p.id_b
)
SELECT i2.id_a, i2.id_b,
       CAST(i2.i AS DOUBLE) / (ca.c + cb.c - i2.i) AS jaccard
FROM inter i2
JOIN cnts ca ON ca.doc_id = i2.id_a
JOIN cnts cb ON cb.doc_id = i2.id_b
WHERE CAST(i2.i AS DOUBLE) / (ca.c + cb.c - i2.i) >= {threshold}
"""

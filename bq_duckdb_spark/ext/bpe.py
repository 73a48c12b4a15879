"""Distributed byte-pair-encoding (BPE) vocabulary training and
application (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units").

Spark-first shape:
- the trainer operates on the WORD-FREQUENCY table (one groupBy of the
  corpus), never the raw token stream — the classic BPE formulation:
  pair statistics are word-internal, so every round touches vocabulary-
  sized data only;
- each merge round is ONE pair-count shuffle plus a 1-row argmax
  reduce; the winning pair (model-sized: two strings) comes back to the
  driver, mirroring the Lloyd's-k-means trainer (similarity.py) where
  the per-round driver payload is the model by definition;
- merge application is a pure JVM higher-order fold (F.aggregate) —
  map-only, no Python in the loop;
- fully deterministic: no RNG, and the argmax tie-breaks on
  (count DESC, left ASC, right ASC), so retries and reruns train the
  identical merge table.

At 100 TB: the corpus is touched once (word-frequency groupBy); all k
rounds run over the distinct-word table (~100M rows for a web corpus —
a few GB), with lineage truncated per round via localCheckpoint so the
plan does not deepen with k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKENS = "split(trim({col}), '\\\\s+')"


def _merge_fold(sym: Column, left: str, right: str) -> Column:
    """Replace every non-overlapping left-to-right (left, right) symbol
    pair with their concatenation — the standard greedy BPE merge, as a
    single JVM aggregate fold over the symbol array.

    The input column is referenced exactly ONCE: k stacked merges must
    grow the expression linearly in k, not 5^k (a multi-reference fold
    — size guard + slice + init — exploded the analyzed tree when
    nested under apply_bpe's per-word transform).  The fold therefore
    starts from an empty accumulator and uses try_element_at, which
    yields NULL (not an ANSI error) while the accumulator is empty."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        is_pair = (F.try_element_at(acc, F.lit(-1)) == F.lit(left)) & (
            x == F.lit(right)
        )
        return F.when(
            is_pair,
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(sym, F.expr("CAST(array() AS ARRAY<STRING>)"), step)


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over whitespace tokens — the trainer's input table."""
    toks = _TOKENS.format(col=text_col)
    return (
        df.select(F.explode_outer(F.expr(toks)).alias("word"))
        .filter(F.col("word").isNotNull() & (F.col("word") != ""))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns
    [(left, right, pair_count), ...] in merge order.  Stops early when
    the best remaining pair occurs fewer than ``min_pair_count`` times
    (weighted by word frequency)."""
    words = word_frequencies(df, text_col).withColumn(
        "s", F.split(F.col("word"), "")
    )
    # one truncation up front: the word-frequency shuffle happens once,
    # not once per round
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            "CASE WHEN size(s) < 2 THEN array() "
            "ELSE transform(sequence(0, size(s) - 2), "
            "i -> struct(s[i] AS left, s[i + 1] AS right)) END"
        )
        best = (
            words.select(F.explode_outer(F.expr(pairs)).alias("p"), "n")
            .filter(F.col("p").isNotNull())
            .groupBy("p.left", "p.right")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], int(best[0]["cnt"])
        merges.append((left, right, cnt))
        words = words.withColumn("s", _merge_fold(F.col("s"), left, right))
        # truncate lineage so round k's plan is not k folds deep
        words = words.localCheckpoint(eager=True)
    return merges


def segment_word(sym: Column, merges: list[tuple[str, str, int]]) -> Column:
    """Apply a learned merge list to a symbol array, in merge order —
    k nested JVM folds, map-only."""
    for left, right, _ in merges:
        sym = _merge_fold(sym, left, right)
    return sym


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize each document with the learned BPE vocabulary: flat
    subword array per document (word-internal merges only, matching the
    trainer).  Map-only — scales with input splits."""
    toks = _TOKENS.format(col=text_col)
    words = F.filter(F.expr(toks), lambda w: w != F.lit(""))
    per_word = F.transform(words, lambda w: segment_word(F.split(w, ""), merges))
    return df.withColumn(out_col, F.flatten(per_word))


_SEP = chr(31)  # unit separator: never appears in whitespace-split tokens


def apply_bpe_oracle_expr(merges: list[tuple[str, str, int]]) -> str:
    """DuckDB expression computing ``apply_bpe``'s per-document subword
    stream as a '|'-joined string, generated from the SAME merge list
    (one definition; an oracle mismatch means the merge semantics
    drifted).

    DuckDB's list_reduce constrains the accumulator to the element type
    (VARCHAR), so the symbol LIST is encoded as a unit-separator-joined
    string: the fold appends ``SEP||x``, or — when the accumulator ends
    with symbol ``left`` and ``x = right`` — rewrites the tail to the
    merged symbol. That is exactly _merge_fold's greedy left-to-right
    non-overlapping semantics; stacked merges re-split and re-fold, so
    the expression grows linearly in the merge count like the Spark
    side."""
    syms = "string_split(w, '')"
    for left, right, _ in merges:
        enc = (
            f"list_reduce({syms}, (acc, x) -> "
            f"CASE WHEN x = '{right}' AND (acc = '{left}' "
            f"OR ends_with(acc, '{_SEP}{left}')) "
            f"THEN substr(acc, 1, length(acc) - {len(left)}) || '{left}{right}' "
            f"ELSE acc || '{_SEP}' || x END)"
        )
        syms = f"string_split({enc}, '{_SEP}')"
    word_seg = f"array_to_string({syms}, '|')"
    return (
        "array_to_string(list_transform("
        r"list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w != ''), "
        f"w -> {word_seg}), '|')"
    )


def train_bpe_oracle_sql(n_merges: int = 8, min_pair_count: int = 2) -> str:
    """The FULL training loop unrolled as DuckDB CTEs (the pagerank /
    kmeans / logreg pattern) — what upgrades text_bpe from rows-only:
    each round recomputes weighted pair counts over the word table,
    picks the argmax pair (count DESC, left, right — the trainer's
    exact tie-break), and re-segments every word with the same
    encoded-string greedy fold as apply_bpe_oracle_expr, GUARDED on
    ``min_pair_count`` (a sub-threshold best pair applies nothing, so
    later rounds are no-ops — exactly the trainer's early stop).
    Output: (doc_id, n_bpe_tokens), the tier-3 entry's shape."""
    S = _SEP
    parts = [
        "WITH w0 AS MATERIALIZED (",
        "    SELECT word, CAST(count(*) AS BIGINT) AS n,",
        f"           array_to_string(string_split(word, ''), '{S}') AS e",
        "    FROM (",
        r"        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word",
        "        FROM documents",
        "    ) WHERE word IS NOT NULL AND word != ''",
        "    GROUP BY word",
        "),",
    ]
    for r in range(1, n_merges + 1):
        prev = f"w{r - 1}"
        fold = (
            f"list_reduce(string_split(e, '{S}'), (acc, x) -> "
            f"CASE WHEN x = m.rhs AND (acc = m.lhs "
            f"OR ends_with(acc, '{S}' || m.lhs)) "
            f"THEN substr(acc, 1, length(acc) - length(m.lhs)) || m.lhs || m.rhs "
            f"ELSE acc || '{S}' || x END)"
        )
        parts += [
            f"p{r} AS MATERIALIZED (",
            "    SELECT sl[CAST(u.i AS INT)] AS lhs,",
            "           sl[CAST(u.i AS INT) + 1] AS rhs, sum(n) AS cnt",
            f"    FROM (SELECT n, string_split(e, '{S}') AS sl FROM {prev}),",
            "         unnest(range(1, len(sl))) AS u(i)",
            "    GROUP BY 1, 2",
            "),",
            f"m{r} AS MATERIALIZED (",
            f"    SELECT lhs, rhs, cnt FROM p{r}",
            "    ORDER BY cnt DESC, lhs, rhs LIMIT 1",
            "),",
            f"w{r} AS MATERIALIZED (",
            "    SELECT w.word, w.n,",
            f"           CASE WHEN m.cnt >= {min_pair_count} THEN {fold} "
            "ELSE w.e END AS e",
            f"    FROM {prev} w CROSS JOIN m{r} m",
            "),",
        ]
    parts += [
        "subs AS MATERIALIZED (",
        f"    SELECT word, len(string_split(e, '{_SEP}')) AS n_sub "
        f"FROM w{n_merges}",
        "),",
        "doc_words AS (",
        "    SELECT doc_id, u.w AS word",
        r"    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr",
        "          FROM documents), unnest(arr) AS u(w)",
        "    WHERE u.w != ''",
        ")",
        "SELECT d.doc_id,",
        "       CAST(coalesce(sum(s.n_sub), 0) AS BIGINT) AS n_bpe_tokens",
        "FROM documents d",
        "LEFT JOIN (SELECT dw.doc_id, s.n_sub FROM doc_words dw",
        "           JOIN subs s USING (word)) s ON s.doc_id = d.doc_id",
        "GROUP BY d.doc_id",
    ]
    return "\n".join(parts)

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

_SEP = chr(31)  # unit separator: never appears in whitespace-split tokens
_MARK = chr(30)  # record separator: symbol-START marker (same contract)

# lineage-truncation interval for the trainer: a merge pass is now ONE
# tiny replace() expression, so plans stay shallow for many rounds and
# the eager per-round localCheckpoint (a full extra Spark job per merge)
# is only needed occasionally to stop very long trainings from
# re-running hundreds of map passes per round
_TRAIN_CKPT_EVERY = 16

# decode: frames are <MARK>symbol<SEP>, so splitting on runs of the two
# control chars recovers the symbol stream (plus ""-artifacts at the
# string edges, stripped by array_remove — "" is never a legal symbol)
_DECODE_RE = f"[{_SEP}{_MARK}]+"


def _enc_syms(sym: Column) -> Column:
    """Frame a symbol array as ``<MARK>s1<SEP><MARK>s2<SEP>...`` — every
    symbol carries BOTH its own start marker and end separator, so a
    literal substring match of two adjacent frames is exactly a
    whole-symbol-pair match (a one-sided encoding is wrong: with plain
    ``s1<SEP>s2`` the merge pattern ``b<SEP>b`` also matches the TAIL of
    a longer symbol like ``ab`` — caught by
    test_apply_bpe_duckdb_oracle_parity_random)."""
    return F.concat(F.lit(_MARK), F.concat_ws(_SEP + _MARK, sym), F.lit(_SEP))


def _merge_pass(enc: Column, left: str, right: str) -> Column:
    """One greedy BPE merge pass over a frame-encoded symbol string:
    replace every ``<MARK>left<SEP><MARK>right<SEP>`` with
    ``<MARK>left+right<SEP>``, left-to-right, non-overlapping.
    ``replace()`` is exactly the greedy fold's scan: it resumes AFTER
    each replacement, so the merged frame is never re-matched within
    the same pass (as the pattern's left it would need
    ``left+right == left``; as its right it sits in already-emitted
    output, which ``replace`` does not rescan), and each match consumes
    two COMPLETE frames, so chained merges of adjacent pairs still fire
    (no boundary characters are shared between neighbouring matches).

    Same greedy semantics as the DuckDB oracle's encoded fold
    (apply_bpe_oracle_expr), moved onto Spark's codegen'd literal-scan
    ``replace`` instead of the round-9 ``F.aggregate`` fold:
    higher-order functions are CodegenFallback (interpreted), and the
    fold's ``concat(slice(acc, ...), ...)`` step copied the accumulator
    array per SYMBOL — O(word_len²) interpreted work per word per
    merge, vs one O(word_len) native scan here (guide §4.1: prefer
    built-ins; measured on text_bpe/text_bpe_apply, see
    OPTIMIZATION_r10.md). Precondition shared with the oracle encoding:
    symbols never contain chr(30)/chr(31), which whitespace-split
    tokens of the supported corpora satisfy."""
    return F.replace(
        enc,
        F.lit(_MARK + left + _SEP + _MARK + right + _SEP),
        F.lit(_MARK + left + right + _SEP),
    )


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
    for round_no in range(n_merges):
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
        # apply the merge as one encoded-string replace pass (see
        # _merge_pass); ``s`` is non-empty and control-char-free by
        # construction (split of a non-empty whitespace-delimited word)
        words = words.withColumn(
            "s",
            F.array_remove(
                F.split(
                    _merge_pass(_enc_syms(F.col("s")), left, right),
                    _DECODE_RE,
                ),
                "",
            ),
        )
        # truncate lineage only every _TRAIN_CKPT_EVERY rounds: a merge
        # pass is one flat replace() now, so re-running the (map-only)
        # passes since the last checkpoint is cheaper than paying an
        # eager materialization JOB every round (the round-9 fold form
        # checkpointed each round, doubling the job count per merge)
        if (round_no + 1) % _TRAIN_CKPT_EVERY == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def segment_word(sym: Column, merges: list[tuple[str, str, int]]) -> Column:
    """Apply a learned merge list to a symbol array, in merge order —
    k chained encoded-string replace passes (see _merge_pass), map-only.
    Symbols must be non-empty and SEP-free (true for character splits
    of whitespace-delimited words). NULL in → NULL out; [] in → [] out
    (the empty encoding "" round-trips through ``array_remove``, since
    "" is never a legitimate symbol)."""
    enc = _enc_syms(sym)
    for left, right, _ in merges:
        enc = _merge_pass(enc, left, right)
    return F.when(sym.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.array_remove(F.split(enc, _DECODE_RE), "")
    )


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize each document with the learned BPE vocabulary: flat
    subword array per document (word-internal merges only, matching the
    trainer).  Map-only — scales with input splits.

    The whole document is encoded ONCE — each word framed per symbol
    (see _enc_syms), words joined by an extra SEP — and every merge is
    a single document-level ``replace`` pass: a merge pattern
    ``<MARK>l<SEP><MARK>r<SEP>`` can never straddle the word boundary
    (the junction reads ``<SEP><SEP><MARK>``, and the pattern never has
    two adjacent SEPs), so word-internal semantics are preserved while
    the per-merge cost drops from one interpreted O(len²) fold per WORD
    (the round-9 ``F.aggregate`` form) to one codegen'd native scan per
    DOCUMENT. The final regex split on control-char runs collapses the
    framing back into the flat subword stream. NULL documents stay
    NULL; a document with no words yields [] ("" is never a legitimate
    subword, so ``array_remove`` only strips the framing artifacts)."""
    toks = _TOKENS.format(col=text_col)
    words = F.filter(F.expr(toks), lambda w: w != F.lit(""))
    enc_words = F.transform(words, lambda w: _enc_syms(F.split(w, "")))
    doc = F.concat_ws(_SEP, enc_words)
    for left, right, _ in merges:
        doc = _merge_pass(doc, left, right)
    flat = F.array_remove(F.split(doc, _DECODE_RE), "")
    return df.withColumn(
        out_col,
        F.when(
            F.col(text_col).isNull(), F.lit(None).cast("array<string>")
        ).otherwise(flat),
    )


def apply_bpe_oracle_expr(merges: list[tuple[str, str, int]]) -> str:
    """DuckDB expression computing ``apply_bpe``'s per-document subword
    stream as a '|'-joined string, generated from the SAME merge list
    (one definition; an oracle mismatch means the merge semantics
    drifted).

    DuckDB's list_reduce constrains the accumulator to the element type
    (VARCHAR), so the symbol LIST is encoded as a unit-separator-joined
    string: the fold appends ``SEP||x``, or — when the accumulator ends
    with symbol ``left`` and ``x = right`` — rewrites the tail to the
    merged symbol. That is exactly _merge_pass's greedy left-to-right
    non-overlapping semantics on the same encoding (the Spark side now
    runs it as a literal ``replace`` scan); stacked merges re-split and
    re-fold, so the expression grows linearly in the merge count like
    the Spark side."""
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

"""Content scrubbing for training-data pipelines: PII redaction and
URL/domain extraction.

All JVM-side regexp ops (regexp_replace / regexp_count /
regexp_extract_all) — map-only until the optional domain aggregation,
so redaction scales with input splits and never shuffles. Patterns are
deliberately in the common regex subset shared by Java and RE2-family
engines so the behavior is oracle-checkable against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# simple, dialect-portable patterns (Java + RE2): no lookarounds
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
ID_RE = r"\d{3}-\d{2}-\d{4}"  # SSN-shaped
PHONE_RE = r"\+?\d[\d\- ]{6,}\d"
URL_RE = r"https?://([^/\s]+)"


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Redact emails, SSN-shaped ids, then phone-like numbers (in that
    order — the id pattern is a substring of the phone pattern) and
    count each. Adds n_emails / n_ids / n_phones / ``out_col``."""
    c = F.col(text_col)
    # column-API regexp_count with lit patterns: no SQL-literal escaping
    return (
        df.withColumn("n_emails", F.regexp_count(c, F.lit(EMAIL_RE)))
        .withColumn(
            "__no_email", F.regexp_replace(c, EMAIL_RE, "[EMAIL]")
        )
        .withColumn("n_ids", F.regexp_count(F.col("__no_email"), F.lit(ID_RE)))
        .withColumn("__no_id", F.regexp_replace(F.col("__no_email"), ID_RE, "[ID]"))
        .withColumn("n_phones", F.regexp_count(F.col("__no_id"), F.lit(PHONE_RE)))
        .withColumn(out_col, F.regexp_replace(F.col("__no_id"), PHONE_RE, "[PHONE]"))
        .drop("__no_email", "__no_id")
    )


def extract_domains(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per URL occurrence: (original columns..., domain).
    Map-only explode; lowercased host part."""
    # explode_outer + null filter: plain explode makes Catalyst infer a
    # pre-Generate filter that re-runs the regex twice more per row (the
    # post-filter below references only the generated column, so the
    # regex runs once); the null filter restores explode's drop of
    # URL-free documents exactly.
    return (
        df.withColumn(
            "domain",
            F.explode_outer(
                F.expr(f"regexp_extract_all({text_col}, 'https?://([^/\\\\s]+)', 1)")
            ),
        )
        .filter(F.col("domain").isNotNull())
        .withColumn("domain", F.lower("domain"))
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_frac: float = 0.2,
    out_col: str = "clean_text",
) -> DataFrame:
    """CCNet-style boilerplate removal: drop lines that appear in more
    than ``max_doc_frac`` of documents (headers, footers, nav chrome),
    keeping each document's remaining lines in order.

    Scale shape: explode to (doc, line_idx, line); line document-
    frequency is one shuffle on the line text (partial-aggregated);
    the frequency table joins back on ``line`` — a natural shuffle
    key — with no broadcast hint (it scales with distinct lines, like
    a vocabulary; AQE broadcasts only when it truly fits); reassembly
    is one shuffle on the doc id with an index-ordered collect.
    """
    lines = df.select(
        F.col(id_col),
        # _outer: computed array (repo convention — plain posexplode
        # lets InferFiltersFromGenerate re-run the split in a pushed
        # filter); split never returns an empty array
        F.posexplode_outer(F.split(F.col(text_col), "\n")).alias(
            "__idx", "__line"
        ),
    )
    line_df = lines.groupBy("__line").agg(
        F.countDistinct(id_col).alias("__line_docs")
    )
    n_docs = df.agg(F.countDistinct(id_col).cast("double").alias("__n_docs"))
    kept = (
        lines.join(line_df, "__line")
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("__line_docs") / F.col("__n_docs") <= max_doc_frac)
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.expr(
                "concat_ws('\\n', transform(array_sort(collect_list("
                "named_struct('i', __idx, 'l', __line))), s -> s.l))"
            ).alias(out_col)
        )
    )


def domain_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level domain frequency: the crawl-style source breakdown.
    One shuffle on domain (partial aggregation map-side)."""
    return (
        extract_domains(df, text_col)
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_urls"))
    )


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

# tracking params dropped by every crawl-dedup pipeline
_TRACKING_PARAM_RE = "(utm_[a-z]+|fbclid|gclid|msclkid|ref)=[^&#]*"


# case-insensitive scheme+authority: spelled as character classes, not
# an (?i) flag — the inline-flag syntax is Java-only, classes are
# portable to RE2-family engines
_SCHEME_AUTH_RE = "^[hH][tT][tT][pP][sS]?://[^/?#]+"


def canonical_url_expr(url: str, engine: str = "spark") -> str:
    """Canonical form of a URL as ONE expression built for the target
    engine from shared pattern definitions (function names match; the
    per-engine differences are exactly (a) DuckDB needs a 'g' flag for
    replace-all where Spark always replaces all, and (b) replacement
    backreferences — avoided entirely, $1 vs \\1).

    Steps, in crawl-frontier order: strip fragment → drop tracking
    params (then orphaned ?/& separators) → lowercase scheme+authority →
    strip default ports → strip trailing slashes (root normalizes to
    the bare authority). Used for URL-level dedup: two fetches of the
    same logical resource canonicalize to the same key, so the dedup is
    an exact groupBy — map-only per row, one shuffle on the canonical
    key corpus-wide.
    """
    g = ", 'g'" if engine != "spark" else ""

    def sub(s: str, pat: str, rep: str = "") -> str:
        return f"regexp_replace({s}, '{pat}', '{rep}'{g})"

    u = url
    u = sub(u, "#.*$")
    u = sub(u, _TRACKING_PARAM_RE)
    u = sub(u, "[?&]+$")          # params were the tail
    u = sub(u, "[?]&+", "?")      # first param dropped
    u = sub(u, "&&+", "&")        # middle param dropped
    # lowercase only scheme://host[:port] (the authority is
    # case-insensitive per RFC 3986; the path is not)
    auth = f"regexp_extract({u}, '({_SCHEME_AUTH_RE})', 1)"
    auth = sub(f"lower({auth})", ":(443|80)$")
    rest = sub(u, _SCHEME_AUTH_RE)
    return sub(f"concat({auth}, {rest})", "/+$")


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canon_url"
) -> DataFrame:
    """Add the canonical form of ``url_col`` (see canonical_url_expr).
    Map-only; zero shuffle."""
    return df.withColumn(out_col, F.expr(canonical_url_expr(url_col)))


# ---------------------------------------------------------------------------
# markup stripping + text normalization
# ---------------------------------------------------------------------------

# the accent fold covers Latin-1's letter block — the dominant case in
# web text; full Unicode NFKC needs ICU, which neither engine exposes
# as a builtin (documented divergence)
_ACCENT_SRC = "àáâãäåèéêëìíîïòóôõöùúûüýÿñçÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÝÑÇ"
_ACCENT_DST = "aaaaaaeeeeiiiiooooouuuuyyncAAAAAAEEEEIIIIOOOOOUUUUYNC"

_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]


def strip_markup_expr(col: str, engine: str = "spark") -> str:
    """Drop HTML/XML tags and decode the common entities — built for the
    target engine (DuckDB needs the 'g' flag for replace-all; plain
    replace() is all-occurrences in both)."""
    g = ", 'g'" if engine != "spark" else ""
    u = f"regexp_replace({col}, '<[^>]*>', ' '{g})"
    for src, dst in _ENTITIES:
        dst_sql = dst.replace("'", "''")
        u = f"replace({u}, '{src}', '{dst_sql}')"
    return u


def normalize_text_expr(col: str, engine: str = "spark") -> str:
    """Dedup-canonical text: markup stripped, entities decoded, accents
    folded (Latin-1 block), lowercased, whitespace collapsed+trimmed.
    One definition, rendered per engine; map-only. The whitespace class
    spells \\t-style escapes, which BOTH literal parsers resolve to the
    same characters (unlike \\s, which Spark's parser would strip)."""
    g = ", 'g'" if engine != "spark" else ""
    u = strip_markup_expr(col, engine)
    u = f"translate({u}, '{_ACCENT_SRC}', '{_ACCENT_DST}')"
    u = f"lower({u})"
    return f"trim(regexp_replace({u}, '[ \\t\\r\\n]+', ' '{g}))"


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """Add the canonical form of ``text_col`` (see normalize_text_expr).
    The standard pre-dedup normalization pass; zero shuffle."""
    return df.withColumn(out_col, F.expr(normalize_text_expr(text_col)))

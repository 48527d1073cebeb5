"""DuckDB oracle SQL for the extraction pipeline.

The driver's correctness gate runs each ``queries()`` entry (Ray) next to
its ``oracle_sql()`` entry (DuckDB over the same parquet views) and
compares row counts + schema + value hashes. The pages corpus is a pure
function of ``documents`` (sources/spec.py), so the expected output of the
WHOLE extraction pipeline — content-type, validation status, routing,
classification, and the extracted text itself — is expressible as one SQL
view over ``documents``. This module generates that SQL from the same
constants the generator uses; any drift between generator, extractor, and
oracle shows up as a hash mismatch.

Layout note: every expression mirrors a function in sources/spec.py — keep
them in lockstep (spec.SPEC_VERSION bumps when semantics change).
"""

from __future__ import annotations

from .functions.classify import MEMO_PHRASES, QP_PHRASES
from .sources import spec

SEP2 = "chr(10) || chr(10)"   # "\n\n"
NL = "chr(10)"                # "\n"


def _pieces(width: int) -> str:
    """list of ``width``-char chunks of ``text`` (1-based substr).

    ``greatest(…, 1)`` keeps lockstep with ``spec.pieces``'s ``or [""]``:
    empty text is ONE empty piece, not zero pieces."""
    return (
        f"list_transform(range(0, greatest(CAST(ceil(length(text)/{width}.0)"
        f" AS BIGINT), 1)), "
        f"j -> substr(text, CAST(j*{width}+1 AS BIGINT), {width}))"
    )


def _rep_join(single: str, rep: str, sep: str) -> str:
    """``sep.join([single] * rep)`` — equals joining the repeated piece list."""
    return (f"(CASE WHEN {rep} > 1 THEN repeat({single} || {sep}, {rep} - 1) "
            f"ELSE '' END || {single})")


def base_cte() -> str:
    """CTEs deriving the expected pipeline output from ``documents``."""
    hsingle = f"array_to_string({_pieces(spec.HTML_PIECE_W)}, {SEP2})"
    psingle = f"array_to_string({_pieces(spec.PDF_LINE_W)}, {NL})"
    table_rows = (
        "array_to_string(list_transform(range(1, nrows + 1), "
        "r -> 'r' || CAST(r AS VARCHAR) || chr(9) || 'v' || "
        "CAST(doc_id * r AS VARCHAR)), " + SEP2 + ")"
    )
    pdf_table_rows = (
        "array_to_string(list_transform(range(1, nrows + 1), "
        "r -> 'r' || CAST(r AS VARCHAR) || chr(9) || 'v' || "
        "CAST(doc_id * r AS VARCHAR)), " + NL + ")"
    )
    phrase = f"'{spec.PHRASE}'"
    meta = (
        "'Subject: ' || source || ' Studies P1 | Grade: ' "
        "|| CAST(doc_id % 12 + 1 AS VARCHAR) "
        f"|| ' | Session: {spec.SESSION} | Year: ' "
        "|| CAST(2017 + doc_id % 8 AS VARCHAR)"
    )

    html_body = _rep_join("hsingle", "rep_h", SEP2)
    pdf_body = _rep_join("psingle", "rep_p", NL)
    pdf_big_body = _rep_join("psingle", "rep_big", NL)

    memo_hits = " + ".join(
        f"(CASE WHEN contains(samp, '{p}') THEN 1 ELSE 0 END)" for p in MEMO_PHRASES)
    qp_hits = " + ".join(
        f"(CASE WHEN contains(samp, '{p}') THEN 1 ELSE 0 END)" for p in QP_PHRASES)

    return f"""
WITH base AS (
  SELECT doc_id, text, lang, source,
         doc_id % 100 AS sub,
         doc_id % 10  AS lastd,
         3 + doc_id % 5 AS rep_h,
         2 + doc_id % 4 AS rep_p,
         150 + (doc_id * 7) % 50 AS rep_big,
         2 + doc_id % 6 AS nrows,
         CAST(ceil(length(text)/{spec.HTML_PIECE_W}.0) AS BIGINT) AS np_h,
         CAST(ceil(length(text)/{spec.PDF_LINE_W}.0) AS BIGINT) AS np_p,
         {hsingle} AS hsingle,
         {psingle} AS psingle,
         {table_rows} AS trows,
         {pdf_table_rows} AS ptrows,
         {meta} AS meta_line
  FROM documents
), flags AS (
  SELECT *,
         (lastd = 5 AND sub < 90) AS has_phrase,
         (sub BETWEEN 40 AND 49) AS has_heading,
         source || ' #' || CAST(doc_id AS VARCHAR) AS heading_txt
  FROM base
), prim AS (
  SELECT *,
    CASE
      WHEN sub BETWEEN 0 AND 64 THEN
        meta_line || {SEP2}
        || (CASE WHEN has_phrase THEN {phrase} || {SEP2} ELSE '' END)
        || (CASE WHEN has_heading THEN heading_txt || {SEP2} ELSE '' END)
        || {html_body}
      WHEN sub BETWEEN 65 AND 69 THEN
        meta_line || {SEP2}
        || (CASE WHEN has_phrase THEN {phrase} || {SEP2} ELSE '' END)
        || {html_body} || {SEP2} || trows
      WHEN sub BETWEEN 70 AND 74 THEN
        meta_line || {NL}
        || (CASE WHEN has_phrase THEN {phrase} || {NL} ELSE '' END)
        || {pdf_body} || {NL} || ptrows
      WHEN sub BETWEEN 75 AND 87 THEN
        meta_line || {NL}
        || (CASE WHEN has_phrase THEN {phrase} || {NL} ELSE '' END)
        || {pdf_body}
      WHEN sub BETWEEN 88 AND 89 THEN
        meta_line || {NL}
        || (CASE WHEN has_phrase THEN {phrase} || {NL} ELSE '' END)
        || {pdf_big_body}
      WHEN sub BETWEEN 90 AND 91 THEN substr(text, 1, 80)
      ELSE ''
    END AS primary_text,
    CASE
      WHEN sub BETWEEN 0 AND 64 THEN
        1 + (CASE WHEN has_phrase THEN 1 ELSE 0 END)
        + (CASE WHEN has_heading THEN 1 ELSE 0 END) + np_h * rep_h
      WHEN sub BETWEEN 65 AND 69 THEN
        1 + (CASE WHEN has_phrase THEN 1 ELSE 0 END) + np_h * rep_h + nrows
      WHEN sub BETWEEN 70 AND 74 THEN
        1 + (CASE WHEN has_phrase THEN 1 ELSE 0 END) + np_p * rep_p + nrows
      WHEN sub BETWEEN 75 AND 87 THEN
        1 + (CASE WHEN has_phrase THEN 1 ELSE 0 END) + np_p * rep_p
      WHEN sub BETWEEN 88 AND 89 THEN
        1 + (CASE WHEN has_phrase THEN 1 ELSE 0 END) + np_p * rep_big
      WHEN sub BETWEEN 90 AND 91 THEN 1
      ELSE 0
    END AS n_blocks,
    CASE WHEN has_heading THEN 1 ELSE 0 END AS n_headings,
    CASE WHEN sub BETWEEN 95 AND 97 THEN 'rejected'
         WHEN sub = 98 THEN 'rejected'
         WHEN sub = 99 THEN 'rejected'
         ELSE 'completed' END AS status,
    CASE WHEN sub BETWEEN 95 AND 97 THEN 'unsupported_type'
         WHEN sub = 98 THEN 'empty'
         WHEN sub = 99 THEN 'too_large'
         ELSE '' END AS error,
    CASE WHEN sub BETWEEN 95 AND 97 THEN 'unknown'
         WHEN sub = 98 THEN 'empty'
         WHEN sub BETWEEN 70 AND 89 OR sub BETWEEN 92 AND 93 THEN 'pdf'
         ELSE 'html' END AS content_type
  FROM flags
), scored AS (
  SELECT *,
    LEAST(
      (CASE WHEN length(primary_text) > 1000 THEN 40
            WHEN length(primary_text) > 500 THEN 30
            WHEN length(primary_text) > 100 THEN 20 ELSE 0 END)
      + (CASE WHEN n_blocks > 50 THEN 30
              WHEN n_blocks > 20 THEN 20
              WHEN n_blocks > 5 THEN 10 ELSE 0 END)
      + (CASE WHEN n_headings >= 5 THEN 15
              WHEN n_headings >= 3 THEN 10
              WHEN n_headings >= 1 THEN 5 ELSE 0 END)
      + (CASE WHEN sub BETWEEN 65 AND 74 THEN
                (CASE WHEN nrows > 3 THEN 15 ELSE 10 END) ELSE 0 END),
      100) AS q_pct
  FROM prim
), routed AS (
  SELECT *,
    CASE WHEN status = 'rejected' THEN 'none'
         WHEN q_pct < {spec.CORPUS_QUALITY_THRESHOLD_PCT} THEN 'salvage'
         ELSE 'primary' END AS route,
    CASE WHEN status = 'rejected' THEN ''
         WHEN sub BETWEEN 92 AND 93 THEN substr(text, 1, 100)
         ELSE primary_text END AS extracted_text
  FROM scored
), classified AS (
  SELECT *,
    lower(substr(extracted_text, 1, 3000)) AS samp
  FROM routed
), expected AS (
  SELECT
    sub, source, doc_id,
    'https://corpus.example/' || source || '/d'
      || lpad(CAST(doc_id AS VARCHAR), 7, '0')
      || (CASE WHEN lastd = 3 THEN '-memo'
               WHEN lastd = 7 THEN '-qp' ELSE '' END) AS url,
    TIMESTAMP '2020-01-01 00:00:00'
      + to_seconds(doc_id * {spec.TS_STEP_S}) AS warc_ts,
    lang, content_type, status, error, route,
    CAST(CASE WHEN status = 'rejected' THEN 0 ELSE q_pct END AS BIGINT)
      AS quality_pct,
    CASE WHEN status = 'rejected' THEN 'unknown'
         WHEN lastd = 3 THEN 'memo'
         WHEN lastd = 7 THEN 'question_paper'
         WHEN ({memo_hits}) > 0 AND ({memo_hits}) > ({qp_hits}) THEN 'memo'
         ELSE 'question_paper' END AS doc_kind,
    CAST(CASE WHEN status = 'rejected' THEN 0
         WHEN lastd IN (3, 7) THEN 90
         WHEN ({memo_hits}) > 0 AND ({memo_hits}) > ({qp_hits})
           THEN LEAST(70 + 5 * ({memo_hits}), 95)
         WHEN ({qp_hits}) > 0 AND ({qp_hits}) > ({memo_hits})
           THEN LEAST(70 + 5 * ({qp_hits}), 95)
         ELSE 50 END AS BIGINT) AS doc_conf_pct,
    CASE WHEN status = 'rejected' THEN 'none'
         WHEN lastd IN (3, 7) THEN 'filename'
         WHEN ({memo_hits}) > 0 AND ({memo_hits}) > ({qp_hits})
           THEN 'content_keywords'
         WHEN ({qp_hits}) > 0 AND ({qp_hits}) > ({memo_hits})
           THEN 'content_keywords'
         ELSE 'default' END AS doc_method,
    extracted_text,
    CAST(length(extracted_text) AS BIGINT) AS n_chars
  FROM classified
)"""


def extract_pipeline_sql() -> str:
    return base_cte() + """
SELECT url, warc_ts, lang, content_type, status, error, route, quality_pct,
       doc_kind, doc_conf_pct, doc_method, extracted_text, n_chars
FROM expected"""


def extract_routing_stats_sql() -> str:
    return base_cte() + """
SELECT content_type, status, route,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(quality_pct) AS BIGINT) AS sum_quality,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM expected
GROUP BY content_type, status, route"""


def section_quality_stats_sql() -> str:
    """Per-site-section extraction rollup (q_section_quality_stats):
    the url's first path segment IS ``source`` by construction."""
    return base_cte() + """
SELECT source AS section,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(CASE WHEN status = 'completed' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_completed,
       CAST(sum(CASE WHEN status = 'rejected' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_rejected,
       CAST(sum(quality_pct) AS BIGINT) AS sum_quality,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM expected GROUP BY source"""


def sniff_counts_sql() -> str:
    return base_cte() + """
SELECT content_type, CAST(count(*) AS BIGINT) AS n_docs
FROM expected GROUP BY content_type"""


def classify_counts_sql() -> str:
    return base_cte() + """
SELECT doc_kind, doc_method, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_conf_pct) AS BIGINT) AS sum_conf
FROM expected GROUP BY doc_kind, doc_method"""


def span_kind_counts_sql() -> str:
    """Expected span-kind totals — verifies the span machinery through the
    driver's value-hash gate (kinds per functions/html_extract._KIND_BY_TAG
    and the pdf 'line' / salvage 'document' conventions)."""
    return base_cte() + """
, spanned AS (
  SELECT c.*,
         (CASE WHEN route = 'primary' AND sub <= 69 THEN
            1 + (CASE WHEN has_phrase THEN 1 ELSE 0 END)
            + (CASE WHEN sub BETWEEN 60 AND 64 THEN 0 ELSE np_h * rep_h END)
          ELSE 0 END) AS n_paragraph,
         (CASE WHEN route = 'primary' AND sub BETWEEN 40 AND 49
               THEN 1 ELSE 0 END) AS n_title,
         (CASE WHEN route = 'primary' AND sub BETWEEN 60 AND 64
               THEN np_h * rep_h ELSE 0 END) AS n_list_item,
         (CASE WHEN route = 'primary' AND sub BETWEEN 65 AND 74
               THEN nrows ELSE 0 END) AS n_table,
         (CASE WHEN route = 'primary' AND sub BETWEEN 70 AND 89 THEN
            1 + (CASE WHEN has_phrase THEN 1 ELSE 0 END)
            + np_p * (CASE WHEN sub <= 87 THEN rep_p ELSE rep_big END)
          ELSE 0 END) AS n_line,
         (CASE WHEN route = 'salvage' AND length(extracted_text) > 0
               THEN 1 ELSE 0 END) AS n_document
  FROM routed c
)
SELECT kind, n_spans FROM (
  SELECT 'paragraph' AS kind, CAST(sum(n_paragraph) AS BIGINT) AS n_spans FROM spanned
  UNION ALL SELECT 'title', CAST(sum(n_title) AS BIGINT) FROM spanned
  UNION ALL SELECT 'list_item', CAST(sum(n_list_item) AS BIGINT) FROM spanned
  UNION ALL SELECT 'table', CAST(sum(n_table) AS BIGINT) FROM spanned
  UNION ALL SELECT 'line', CAST(sum(n_line) AS BIGINT) FROM spanned
  UNION ALL SELECT 'document', CAST(sum(n_document) AS BIGINT) FROM spanned
) WHERE n_spans > 0"""


def canonical_names_sql() -> str:
    """Expected canonical names — derived from the same metadata header
    the Ray side PARSES back out of the extracted text (reference:
    FullExamPaper.build_canonical_filename, app/models/extraction.py:
    131-161, fields parsed from the document)."""
    slug = ("trim(regexp_replace(regexp_replace(regexp_replace(lower({x}), "
            "'[/\\\\]+', '-', 'g'), '[^a-z0-9-]+', '-', 'g'), '-+', '-', 'g'),"
            " '-')")
    subject = slug.format(x="source || ' Studies P1'")
    session = slug.format(x=f"'{spec.SESSION}'")
    return base_cte() + f"""
SELECT url,
       substr(sha256(extracted_text), 1, 12) || '-' || {subject}
       || '-gr' || CAST(doc_id % 12 + 1 AS VARCHAR)
       || '-' || {session}
       || '-' || CAST(2017 + doc_id % 8 AS VARCHAR)
       || (CASE WHEN doc_kind = 'memo' THEN '-mg' ELSE '-qp' END)
       AS canonical_name
FROM expected WHERE sub BETWEEN 0 AND 89"""


def pdf_elements_sql() -> str:
    """Expected per-document layout-element stats for primary-routed PDFs —
    drives the bbox column through the value-hash gate. Constants mirror
    the generator layout (gen_pdf MARGIN_X/CELL_STRIDE/TOP_Y/LEADING/
    LINES_PER_PAGE) and the parser's bbox estimates (pdf_extract CHAR_W)."""
    from .functions.pdf_extract import CHAR_W
    from .sources.gen_pdf import (CELL_STRIDE, LEADING, LINES_PER_PAGE,
                                  MARGIN_X, TOP_Y)

    from .sources.gen_pdf import COL2_X

    phrase_len = len(spec.PHRASE)
    cell2_x = MARGIN_X + CELL_STRIDE
    # two-column variant (spec.pdf_twocol): left band rows 0..ceil(n/2)-1,
    # right band at COL2_X — bbox extrema and the right-band count pin the
    # reading-order geometry (text alone cannot distinguish the layouts)
    twocol = "(sub BETWEEN 75 AND 87 AND doc_id % 5 = 4)"
    half = 23  # left rows on a full 45-line two-column page
    n_left = (f"((n_blocks // {LINES_PER_PAGE}) * {half}"
              f" + (n_blocks % {LINES_PER_PAGE} + 1) // 2)")
    return base_cte() + f"""
SELECT
  'https://corpus.example/' || source || '/d'
    || lpad(CAST(doc_id AS VARCHAR), 7, '0')
    || (CASE WHEN lastd = 3 THEN '-memo'
             WHEN lastd = 7 THEN '-qp' ELSE '' END) AS url,
  CAST(n_blocks AS BIGINT) AS n_elements,
  CAST(CASE WHEN sub BETWEEN 70 AND 74 THEN nrows ELSE 0 END AS BIGINT)
    AS n_table_rows,
  CAST(GREATEST(
    (CASE WHEN {twocol} THEN {COL2_X} ELSE {MARGIN_X} END)
      + {CHAR_W} * LEAST({spec.PDF_LINE_W}, length(text)),
    {MARGIN_X} + {CHAR_W} * length(meta_line),
    CASE WHEN has_phrase
         THEN {MARGIN_X} + {CHAR_W} * {phrase_len} ELSE 0 END,
    CASE WHEN sub BETWEEN 70 AND 74
         THEN {cell2_x} + {CHAR_W}
              * (1 + length(CAST(doc_id * nrows AS VARCHAR)))
         ELSE 0 END) AS BIGINT) AS x1_max,
  CAST(CASE WHEN {twocol}
       THEN {TOP_Y} - {LEADING}
            * ((LEAST(n_blocks, {LINES_PER_PAGE}) + 1) // 2 - 1)
       ELSE {TOP_Y} - {LEADING} * (CASE WHEN n_blocks >= {LINES_PER_PAGE}
            THEN {LINES_PER_PAGE} - 1 ELSE n_blocks - 1 END)
       END AS BIGINT) AS y0_min,
  CAST(CASE WHEN {twocol} THEN n_blocks - {n_left} ELSE 0 END AS BIGINT)
    AS n_rightcol
FROM routed
WHERE sub BETWEEN 70 AND 89 AND route = 'primary'"""


def url_canonical_dedup_sql() -> str:
    """Replicates q_url_canonical_dedup: the planted messy variants and
    the canonicalization rules of functions/urlnorm.py (drop fragment,
    lowercase scheme+host, drop utm_* params, sort survivors, strip
    trailing slashes) as DuckDB string/list kernels."""
    return base_cte() + """
, variants AS (
  SELECT url AS u FROM expected
  UNION ALL
  SELECT string_split(url, '/')[1] || '//' || upper(string_split(url, '/')[3])
         || '/' || array_to_string(string_split(url, '/')[4:], '/')
         || '/?utm_source=feed&utm_b=2#frag'
  FROM expected WHERE length(url) % 3 = 0
  UNION ALL
  SELECT url || '?z=1&a=2' FROM expected WHERE length(url) % 5 = 0
  UNION ALL
  SELECT url || '?a=2&z=1' FROM expected WHERE length(url) % 5 = 0
), split_q AS (
  SELECT CASE WHEN strpos(b, '?') > 0
              THEN substr(b, 1, strpos(b, '?') - 1) ELSE b END AS base,
         CASE WHEN strpos(b, '?') > 0
              THEN substr(b, strpos(b, '?') + 1) ELSE '' END AS q
  FROM (SELECT string_split(u, '#')[1] AS b FROM variants)
), canon AS (
  SELECT lower(string_split(base, '/')[1]) || '//'
         || lower(string_split(base, '/')[3])
         || regexp_replace(
              CASE WHEN len(string_split(base, '/')) > 3
                   THEN '/' || array_to_string(string_split(base, '/')[4:], '/')
                   ELSE '' END, '/+$', '') AS cbase,
         list_sort(list_filter(string_split(q, '&'),
                               p -> p <> '' AND NOT starts_with(p, 'utm_')))
           AS plist
  FROM split_q
)
SELECT cbase || CASE WHEN len(plist) > 0
                     THEN '?' || array_to_string(plist, '&')
                     ELSE '' END AS canonical_url,
       CAST(count(*) AS BIGINT) AS n_urls
FROM canon GROUP BY 1"""


def url_parts_stats_sql() -> str:
    return base_cte() + """
SELECT string_split(url, '/')[3] AS host,
       string_split(url, '/')[4] AS section,
       CASE WHEN url LIKE '%-memo' THEN 'memo'
            WHEN url LIKE '%-qp' THEN 'qp' ELSE 'plain' END AS doc_tag,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM expected GROUP BY 1, 2, 3"""


LINE_MIN_DOCS = 3  # lines in >= this many docs count as boilerplate


def _line_stats_cte() -> str:
    """Per-distinct-line corpus stats over the expected extracted text
    (empty separator lines dropped, as stages/linededup does)."""
    return f"""
, lines AS (
  SELECT url, unnest(string_split(extracted_text, {NL})) AS line
  FROM expected
), linestats AS (
  SELECT line, CAST(count(*) AS BIGINT) AS n_occ,
         CAST(count(DISTINCT url) AS BIGINT) AS n_docs
  FROM lines WHERE line <> '' GROUP BY line
)"""


def boilerplate_lines_sql() -> str:
    return base_cte() + _line_stats_cte() + f"""
SELECT line, n_occ, n_docs FROM linestats WHERE n_docs >= {LINE_MIN_DOCS}"""


def line_dedup_docs_sql() -> str:
    return base_cte() + _line_stats_cte() + f"""
, blist AS (
  SELECT coalesce(list(line), []) AS bl
  FROM linestats WHERE n_docs >= {LINE_MIN_DOCS}
)
SELECT url, coalesce(array_to_string(kept, {NL}), '') AS clean_text,
       CAST(len(kept) AS BIGINT) AS n_kept,
       CAST(len(all_l) - len(kept) AS BIGINT) AS n_dropped
FROM (
  SELECT url,
         list_filter(all_l, x -> NOT list_contains(bl, x)) AS kept,
         all_l
  FROM (
    SELECT url,
           list_filter(string_split(extracted_text, {NL}),
                       x -> x <> '') AS all_l
    FROM expected
  ), blist
)"""


def c4_line_filter_sql(min_words: int = 3, min_lines: int = 5) -> str:
    """Replicates stages/linededup.py:c4_line_filter with its defaults
    (terminal-punct rule off — punctuation-free corpus): line survives
    iff >= min_words space-words and no 'javascript'; page keep iff
    >= min_lines survivors and no 'lorem ipsum' / '{{' ban."""
    brace = "chr(123)"  # literal '{' without fighting f-string braces
    return base_cte() + f"""
, c4 AS (
  SELECT url, extracted_text AS t,
         list_filter(string_split(extracted_text, {NL}),
                     x -> x <> '') AS all_l,
         list_filter(string_split(extracted_text, {NL}),
                     x -> x <> ''
                          AND len(string_split(x, ' ')) >= {min_words}
                          AND NOT contains(lower(x), 'javascript'))
           AS kept
  FROM expected
)
SELECT url,
       (len(kept) >= {min_lines}
        AND NOT contains(lower(t), 'lorem ipsum')
        AND NOT contains(t, {brace})) AS keep,
       coalesce(array_to_string(kept, {NL}), '') AS clean_text,
       CAST(len(kept) AS BIGINT) AS n_kept,
       CAST(len(all_l) - len(kept) AS BIGINT) AS n_dropped
FROM c4"""


def repetition_stats_sql() -> str:
    """Within-document repetition signals: line-level duplicate counts
    (empty separator lines dropped) and bigram totals/max over a plain
    single-space split of the full extracted text."""
    return base_cte() + f"""
, doc_lines AS (
  SELECT url, unnest(string_split(extracted_text, {NL})) AS line
  FROM expected
), line_rollup AS (
  SELECT url,
         CAST(sum(c) AS BIGINT) AS n_lines,
         CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT)
           AS n_dup_lines
  FROM (SELECT url, line, count(*) AS c FROM doc_lines
        WHERE line <> '' GROUP BY url, line)
  GROUP BY url
), doc_bigrams AS (
  SELECT url, unnest(list_transform(range(1, len(w)),
                                    i -> w[i] || ' ' || w[i+1])) AS bg
  FROM (SELECT url, string_split(extracted_text, ' ') AS w FROM expected)
), bigram_rollup AS (
  SELECT url,
         CAST(sum(c) AS BIGINT) AS n_bigrams,
         CAST(max(c) AS BIGINT) AS top_bigram_n
  FROM (SELECT url, bg, count(*) AS c FROM doc_bigrams GROUP BY url, bg)
  GROUP BY url
)
SELECT e.url,
       coalesce(l.n_lines, 0) AS n_lines,
       coalesce(l.n_dup_lines, 0) AS n_dup_lines,
       coalesce(b.n_bigrams, 0) AS n_bigrams,
       coalesce(b.top_bigram_n, 0) AS top_bigram_n
FROM expected e
LEFT JOIN line_rollup l ON e.url = l.url
LEFT JOIN bigram_rollup b ON e.url = b.url"""


def export_markdown_sql() -> str:
    from .pipelines.export import markdown_sql_projection
    return base_cte() + f"""
SELECT url, {markdown_sql_projection()}
FROM expected"""

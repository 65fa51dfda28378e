"""PII redaction — a standard pass in large-scale training-data
pipelines: mask emails / URLs / phone-like numbers with placeholder
tokens and count what was masked.

Scale design: the whole transform is Arrow compute kernels
(``replace_substring_regex`` / ``count_substring_regex``) running
zero-copy on the batch's string column — no Python per row, no state,
no shuffle; output is one streaming ``map_batches`` stage.

Parity design: pyarrow's regex engine is RE2 and so is DuckDB's, so
the ORACLE runs the byte-identical patterns through nested
``regexp_replace(..., 'g')`` stages. The stages apply in a defined
order (URL → email → phone), and each category is counted on the text
AS IT STANDS at that stage (so an email inside a URL counts as URL
only) — both sides implement exactly that sequence.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible patterns, shared verbatim with the DuckDB oracle
URL_RE = r"https?://\S+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"

# (placeholder, pattern) in application order
STAGES = (
    ("n_urls", URL_RE, "<URL>"),
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_phones", PHONE_RE, "<PHONE>"),
)


def redact_pii_batch(batch: pa.Table) -> pa.Table:
    text = pc.cast(batch.column("text"), pa.string())
    # nulls count/redact as empty
    text = pc.fill_null(text, "")
    cols: dict[str, pa.Array] = {"doc_id": batch.column("doc_id")}
    for count_name, pattern, placeholder in STAGES:
        cols[count_name] = pc.cast(
            pc.count_substring_regex(text, pattern), pa.int64()
        )
        text = pc.replace_substring_regex(text, pattern, placeholder)
    cols["redacted_text"] = text
    return pa.table(
        {
            "doc_id": cols["doc_id"],
            "redacted_text": cols["redacted_text"],
            "n_urls": cols["n_urls"],
            "n_emails": cols["n_emails"],
            "n_phones": cols["n_phones"],
        }
    )


def redact_pii(docs):
    """(doc_id, text) → (doc_id, redacted_text, n_urls, n_emails,
    n_phones); stateless streaming stage."""
    return docs.map_batches(redact_pii_batch, batch_format="pyarrow")


def oracle_sql() -> str:
    """DuckDB equivalent: the same RE2 patterns, same stage order, each
    count taken on the stage's input text."""
    url, email, phone = URL_RE, EMAIL_RE, PHONE_RE

    def q(s: str) -> str:
        # DuckDB single-quoted literals keep backslashes verbatim, so
        # only quotes need escaping — the RE2 pattern passes through
        return s.replace("'", "''")

    return (
        "WITH s0 AS (\n"
        " SELECT doc_id, COALESCE(text, '') AS t FROM documents\n"
        "), s1 AS (\n"
        f" SELECT doc_id, CAST(len(regexp_extract_all(t, '{q(url)}')) AS BIGINT) AS n_urls,\n"
        f"  regexp_replace(t, '{q(url)}', '<URL>', 'g') AS t FROM s0\n"
        "), s2 AS (\n"
        f" SELECT doc_id, n_urls, CAST(len(regexp_extract_all(t, '{q(email)}')) AS BIGINT) AS n_emails,\n"
        f"  regexp_replace(t, '{q(email)}', '<EMAIL>', 'g') AS t FROM s1\n"
        "), s3 AS (\n"
        f" SELECT doc_id, n_urls, n_emails, CAST(len(regexp_extract_all(t, '{q(phone)}')) AS BIGINT) AS n_phones,\n"
        f"  regexp_replace(t, '{q(phone)}', '<PHONE>', 'g') AS t FROM s2\n"
        ")\n"
        "SELECT doc_id, t AS redacted_text, n_urls, n_emails, n_phones FROM s3"
    )


def pii_rate_by_source(docs):
    """(source, n_docs, n_pii_docs, n_urls, n_emails, n_phones,
    rate_millionths): the per-source PII exposure rollup a corpus audit
    runs before release. Counts reuse the staged redaction semantics
    above (each category counted on the text as the previous stage left
    it), each block collapses to <= |sources| partial rows, and the
    rate is exact integer millionths (truncating division — nonnegative
    operands, so DuckDB's `//` and numpy agree)."""
    import numpy as np
    from ray.data.aggregate import Sum

    part_schema = pa.schema(
        [
            ("source", pa.string()),
            ("n_docs", pa.int64()),
            ("n_pii_docs", pa.int64()),
            ("n_urls", pa.int64()),
            ("n_emails", pa.int64()),
            ("n_phones", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return part_schema.empty_table()
        text = pc.fill_null(pc.cast(t.column("text"), pa.string()), "")
        counts = {}
        for count_name, pattern, placeholder in STAGES:
            counts[count_name] = pc.cast(
                pc.count_substring_regex(text, pattern), pa.int64()
            ).to_numpy(zero_copy_only=False)
            text = pc.replace_substring_regex(text, pattern, placeholder)
        has = (
            (counts["n_urls"] + counts["n_emails"] + counts["n_phones"]) > 0
        ).astype(np.int64)
        t2 = pa.table(
            {
                "source": t.column("source"),
                "n_docs": pa.array(
                    np.ones(t.num_rows, np.int64), pa.int64()
                ),
                "n_pii_docs": pa.array(has, pa.int64()),
                "n_urls": pa.array(counts["n_urls"], pa.int64()),
                "n_emails": pa.array(counts["n_emails"], pa.int64()),
                "n_phones": pa.array(counts["n_phones"], pa.int64()),
            }
        )
        g = t2.group_by("source").aggregate(
            [(c, "sum") for c in part_schema.names[1:]]
        )
        return pa.table(
            {
                "source": g["source"],
                **{
                    c: pc.cast(g[c + "_sum"], pa.int64())
                    for c in part_schema.names[1:]
                },
            }
        )

    merged = (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            *[Sum(c, alias_name=c) for c in part_schema.names[1:]]
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.schema(
                list(part_schema)
                + [pa.field("rate_millionths", pa.int64())]
            ).empty_table()
        import numpy as np

        nd = t["n_docs"].to_numpy(zero_copy_only=False)
        np_ = t["n_pii_docs"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "rate_millionths",
            pa.array(np_ * 1_000_000 // nd, pa.int64()),
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def pii_rate_by_source_sql() -> str:
    def q(s: str) -> str:
        # DuckDB single-quoted literals keep backslashes verbatim, so
        # only quotes need escaping — the RE2 pattern passes through
        return s.replace("'", "''")

    url, email, phone = STAGES[0][1], STAGES[1][1], STAGES[2][1]
    return (
        "WITH s0 AS (\n"
        " SELECT source, COALESCE(text, '') AS t FROM documents\n"
        "), s1 AS (\n"
        f" SELECT source, CAST(len(regexp_extract_all(t, '{q(url)}'))"
        " AS BIGINT) AS n_urls,\n"
        f"  regexp_replace(t, '{q(url)}', '<URL>', 'g') AS t FROM s0\n"
        "), s2 AS (\n"
        " SELECT source, n_urls,"
        f" CAST(len(regexp_extract_all(t, '{q(email)}')) AS BIGINT)"
        " AS n_emails,\n"
        f"  regexp_replace(t, '{q(email)}', '<EMAIL>', 'g') AS t FROM s1\n"
        "), s3 AS (\n"
        " SELECT source, n_urls, n_emails,"
        f" CAST(len(regexp_extract_all(t, '{q(phone)}')) AS BIGINT)"
        " AS n_phones\n"
        " FROM s2\n"
        ")\n"
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,\n"
        " CAST(SUM(CASE WHEN n_urls + n_emails + n_phones > 0"
        " THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs,\n"
        " CAST(SUM(n_urls) AS BIGINT) AS n_urls,\n"
        " CAST(SUM(n_emails) AS BIGINT) AS n_emails,\n"
        " CAST(SUM(n_phones) AS BIGINT) AS n_phones,\n"
        " CAST(SUM(CASE WHEN n_urls + n_emails + n_phones > 0"
        " THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)"
        " AS rate_millionths\n"
        "FROM s3 GROUP BY source"
    )

"""WARC (ISO 28500) archive sink/source — the interchange format every
production crawler emits (Common Crawl, Heritrix). The reference keeps
pages in memory / hands them to plugins (ProcessPage.java:218); at
100 TB the archive IS the deliverable, so this maps the pages table to
standard WARC response records and back.

Write path is 100% JVM-native: each record is one ``concat`` projection
(Content-Length via octet_length — byte-accurate for multi-byte UTF-8)
and lands through the text writer with a CRLF-CRLF lineSep, one .warc
file per partition — no Python, no driver collect, no shuffle.

Read path: one file per task (``wholetext``, the WARC convention of
many ~1 GB archive files gives file-level parallelism), framed strictly
by Content-Length in a pandas mapInPandas parser — content containing
``WARC/1.0`` or bare CRLFs cannot confuse the framing.

Gzip (.warc.gz, per-record gzip members) is NOT implemented: Spark's
text writer cannot emit per-record gzip members. Plumbing and record
schema are real and round-trip-tested on uncompressed WARC.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RECORD_SEP = "\r\n\r\n"

WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content", T.StringType()),
    ]
)


def pages_to_warc_records(
    df: DataFrame,
    url_col: str = "url",
    content_col: str = "content",
    status_col: str | None = None,
    date_col: str | None = None,
) -> DataFrame:
    """Project pages into single-column WARC/1.0 response records
    (column ``value``), ready for ``write_warc``. Record IDs are
    deterministic (xxhash64 of url+content) so re-runs of the same
    crawl produce byte-identical archives — the idempotent-sink
    property a resumable 100-TB pipeline needs."""
    status = (
        F.col(status_col).cast("int") if status_col else F.lit(200)
    )
    date = (
        F.date_format(F.col(date_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        if date_col
        else F.lit("2024-01-01T00:00:00Z")
    )
    http_block = F.concat(
        F.lit("HTTP/1.1 "), status, F.lit(" OK\r\n"),
        F.lit("Content-Type: text/html\r\n\r\n"),
        F.col(content_col),
    )
    record = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.lit("WARC-Target-URI: "), F.col(url_col), F.lit("\r\n"),
        F.lit("WARC-Date: "), date, F.lit("\r\n"),
        F.lit("WARC-Record-ID: <urn:xxh64:"),
        F.lower(F.hex(F.xxhash64(F.col(url_col), F.col(content_col)))),
        F.lit(">\r\n"),
        F.lit("Content-Type: application/http; msgtype=response\r\n"),
        F.lit("Content-Length: "), F.octet_length(http_block),
        F.lit("\r\n\r\n"),
        http_block,
    )
    return df.select(record.alias("value"))


def write_warc(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    content_col: str = "content",
    status_col: str | None = None,
    date_col: str | None = None,
) -> None:
    """Write pages as WARC files, one ``part-*.txt`` archive per
    partition (rename-free: the extension does not affect WARC
    readers, which sniff the ``WARC/1.0`` magic)."""
    records = pages_to_warc_records(df, url_col, content_col, status_col, date_col)
    records.write.mode("overwrite").option("lineSep", RECORD_SEP).text(out_dir)


def _parse_warc_bytes(data: bytes) -> list[tuple]:
    """Strict Content-Length framing over one archive's bytes."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLF padding
        while pos < n and data[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"bad WARC framing at byte {pos}")
        hdr_end = data.index(b"\r\n\r\n", pos)
        headers = {}
        for line in data[pos:hdr_end].decode("utf-8").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers["content-length"])
        body = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        status = None
        content = b""
        if headers.get("warc-type") == "response" and body.startswith(b"HTTP/"):
            line_end = body.index(b"\r\n")
            status = int(body[:line_end].decode("utf-8").split(" ")[1])
            try:
                body_start = body.index(b"\r\n\r\n") + 4
            except ValueError:
                body_start = len(body)
            content = body[body_start:]
        out.append(
            (
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                headers.get("warc-record-id"),
                status,
                content.decode("utf-8"),
            )
        )
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC archives into (url, warc_date, record_id, status,
    content), one file per task."""
    raw = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for txt in pdf["value"]:
                rows.extend(_parse_warc_bytes(txt.encode("utf-8")))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return raw.mapInPandas(parse, WARC_SCHEMA)

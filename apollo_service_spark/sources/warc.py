"""WARC (Web ARChive, ISO 28500) record serialization and distributed parse.

Common Crawl publishes its corpus as WARC segments — concatenated records,
each a CRLF-terminated header block (``WARC/1.0`` + named fields +
``Content-Length``) followed by exactly ``Content-Length`` body octets and a
blank-line terminator.  For *response* records the body is an HTTP/1.1
response (status line + headers + payload).  This module gives the engine a
WARC-shaped ingest surface over the same input-table schema the rest of the
engine consumes (``url, warc_ts, html/text``):

* :func:`build_warc_record` / :func:`build_warc_segment` — deterministic
  serializers (pure functions of the record fields; no clock, no UUIDs —
  the record id is a sha256 of the target URI + date so the same inputs
  always produce the same bytes).
* :func:`parse_warc_segment` — the inverse: scan a segment blob, yield one
  dict per *response* record (non-response records — warcinfo, request,
  metadata — are skipped exactly as a crawler ingest does), byte-exact
  payloads.
* :func:`warc_records` — the Spark surface: ``mapInPandas`` over a frame of
  ``(segment: binary)`` rows → one output row per response record
  ``(url, warc_ts, content_type, payload)``.  One segment is one input row,
  so parallelism = segment count — exactly how Common Crawl shards scale
  (a 100 TB crawl is ~72k segment files; Spark schedules one task per
  segment, no shuffle anywhere).

Read path for on-disk segments: ``spark.read.format("binaryFile")`` →
rename ``content`` to ``segment`` → :func:`warc_records`.  The gate query
``warc_roundtrip`` (plans/queries.py) drives serialize → concatenate →
parse end-to-end in-engine and hash-compares payload lengths/sha256 against
a DuckDB oracle that derives them from the source table WITHOUT ever seeing
WARC bytes — so the round trip, not just the parser, is what's verified.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

_CRLF = b"\r\n"
_WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"


def _warc_date(ts: datetime) -> str:
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    return ts.strftime(_WARC_DATE_FMT)


def build_warc_record(
    url: str,
    ts: datetime,
    payload: bytes,
    content_type: str = "text/html",
    status: str = "200 OK",
) -> bytes:
    """One WARC/1.0 *response* record: WARC header block, HTTP/1.1 response
    block, payload, blank-line terminator.  Deterministic: the record id is
    derived from (url, date), never from a clock or RNG."""
    http = (
        f"HTTP/1.1 {status}".encode() + _CRLF
        + f"Content-Type: {content_type}".encode() + _CRLF
        + f"Content-Length: {len(payload)}".encode() + _CRLF
        + _CRLF
        + payload
    )
    date = _warc_date(ts)
    rec_id = hashlib.sha256(f"{url}\x00{date}".encode()).hexdigest()
    header = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + f"WARC-Record-ID: <urn:sha256:{rec_id}>".encode() + _CRLF
        + f"WARC-Date: {date}".encode() + _CRLF
        + f"WARC-Target-URI: {url}".encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + f"Content-Length: {len(http)}".encode() + _CRLF
        + _CRLF
    )
    return header + http + _CRLF + _CRLF


def build_warcinfo(segment_name: str) -> bytes:
    """The warcinfo preamble record real segments carry — emitted by the
    serializer and SKIPPED by the parser, so tests exercise the skip."""
    body = f"software: apollo-service-spark\r\nisPartOf: {segment_name}\r\n".encode()
    header = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: warcinfo" + _CRLF
        + f"WARC-Record-ID: <urn:sha256:{hashlib.sha256(segment_name.encode()).hexdigest()}>".encode()
        + _CRLF
        + b"WARC-Date: 2020-01-01T00:00:00Z" + _CRLF
        + b"Content-Type: application/warc-fields" + _CRLF
        + f"Content-Length: {len(body)}".encode() + _CRLF
        + _CRLF
    )
    return header + body + _CRLF + _CRLF


def build_warc_segment(
    records: list, segment_name: str = "segment-0", compress: bool = False
) -> bytes:
    """warcinfo preamble + one response record per (url, ts, payload[,
    content_type]) tuple, concatenated — the on-disk segment layout.
    ``compress=True`` produces the REAL Common-Crawl layout: one gzip
    member per record (``.warc.gz``), deterministic (mtime pinned to 0,
    fixed compression level), which is what makes compressed-domain
    ranged reads — and therefore CDX offsets — possible."""
    out = [build_warcinfo(segment_name)]
    for rec in records:
        out.append(build_warc_record(*rec))
    if not compress:
        return b"".join(out)
    import gzip

    return b"".join(
        gzip.compress(chunk, compresslevel=6, mtime=0) for chunk in out
    )


_GZIP_MAGIC = b"\x1f\x8b"


def _gzip_members(blob: bytes) -> list:
    """Split a multi-member gzip stream into ``(offset, length, data)``
    per member — the real Common-Crawl segment layout is one gzip member
    PER RECORD, which is exactly what makes compressed-domain ranged
    reads possible (the CDX index points at member boundaries)."""
    import zlib

    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        d = zlib.decompressobj(31)  # 31 = gzip container
        try:
            data = d.decompress(blob[pos:])
            while not d.eof and not d.unused_data:
                tail = d.decompress(b"")
                if not tail:
                    break
                data += tail
            if not d.eof:
                raise ValueError(f"truncated gzip member at offset {pos}")
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member at offset {pos}: {exc}")
        consumed = n - pos - len(d.unused_data)
        out.append((pos, consumed, data))
        pos += consumed
    return out


def parse_warc_segment(blob: bytes, with_offsets: bool = False) -> list:
    """Scan one segment; return a dict per *response* record:
    ``{url, warc_ts (naive-UTC datetime), content_type, payload (bytes)}``
    — plus ``offset``/``length`` when ``with_offsets`` is set, so a CDX
    index built from these slices supports ranged random access.

    Accepts BOTH layouts Common Crawl uses: plain concatenated records,
    and ``.warc.gz`` (one gzip member per record — detected by magic
    bytes).  For gzip input, offsets/lengths are COMPRESSED-domain member
    extents, matching real CDX semantics: slicing (offset, length) out of
    the ``.warc.gz`` file yields a standalone gzip member this same
    function parses.

    Structural errors raise ``ValueError`` with the byte offset — a
    truncated or corrupt segment must fail loudly, not yield partial rows
    (at crawl scale a silently half-read segment is unrecoverable data
    loss; the caller retries the whole file)."""
    if blob[:2] == _GZIP_MAGIC:
        records = []
        for moff, mlen, data in _gzip_members(blob):
            for rec in parse_warc_segment(data, with_offsets=False):
                if with_offsets:
                    rec["offset"] = moff
                    rec["length"] = mlen
                records.append(rec)
        return records
    records = []
    pos = 0
    n = len(blob)
    while pos < n:
        head_end = blob.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError(f"unterminated WARC header block at offset {pos}")
        header = blob[pos:head_end].decode("utf-8", errors="strict")
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"missing WARC version line at offset {pos}")
        fields = {}
        for line in lines[1:]:
            key, _, value = line.partition(":")
            fields[key.strip().lower()] = value.strip()
        length = int(fields["content-length"])
        body_start = head_end + 4
        body_end = body_start + length
        if body_end + 4 > n:
            raise ValueError(f"truncated record body at offset {body_start}")
        if blob[body_end:body_end + 4] != _CRLF + _CRLF:
            raise ValueError(f"missing record terminator at offset {body_end}")
        if fields.get("warc-type") == "response":
            body = blob[body_start:body_end]
            http_end = body.find(_CRLF + _CRLF)
            if http_end < 0:
                raise ValueError(f"malformed HTTP block at offset {body_start}")
            content_type = "application/octet-stream"
            # HTTP headers are raw octets in the wild (ISO 28500 only
            # requires UTF-8 for WARC headers): real Common-Crawl records
            # carry Latin-1 header bytes, and a strict decode would kill
            # the whole segment task (ADVICE r5).  latin-1 is lossless on
            # arbitrary bytes, so parsing stays deterministic.
            for line in body[:http_end].decode("latin-1").split("\r\n")[1:]:
                key, _, value = line.partition(":")
                if key.strip().lower() == "content-type":
                    content_type = value.strip()
            rec = {
                "url": fields["warc-target-uri"],
                "warc_ts": datetime.strptime(
                    fields["warc-date"], _WARC_DATE_FMT
                ),
                "content_type": content_type,
                "payload": body[http_end + 4:],
            }
            if with_offsets:
                rec["offset"] = pos
                rec["length"] = body_end + 4 - pos
            records.append(rec)
        pos = body_end + 4
    return records


def warc_records(segments):
    """Distributed parse: a DataFrame with a binary ``segment`` column →
    one row per response record ``(url, warc_ts, content_type, payload)``.
    ``mapInPandas`` because one input row fans out to many output rows;
    zero shuffles — each segment parses inside its own task, which is the
    Common-Crawl sharding model (one task per segment file)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["segment"]:
                rows.extend(parse_warc_segment(bytes(blob)))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "content_type", "payload"]
            )

    return segments.mapInPandas(
        gen,
        schema="url string, warc_ts timestamp, content_type string, payload binary",
    )


def read_warc(spark, path: str):
    """On-disk segments → records, via Spark's binaryFile source (each
    ``.warc`` file is one row, hence one parse task)."""
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path)
    return warc_records(files.select(F.col("content").alias("segment")))


def segments_from_pages(pages, n_segments: int = 8):
    """Serialize a ``pages``-shaped frame (url, warc_ts, html, …) into WARC
    segment blobs — the inverse of :func:`pages_from_warc`.  HTML rows
    become ``text/html`` response records carrying the html bytes;
    non-HTML rows (``html`` null — the corpus's fetched-but-never-expanded
    document urls) become ``application/octet-stream`` records with an
    empty payload, so the null/non-null distinction the engine's fetch
    stage branches on survives the round trip.  Deterministic: segment
    assignment is ``crc32(url) % n_segments`` and records sort by url
    within a segment, so the same pages always produce the same bytes."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("url")
        recs = []
        for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
            if html is None:
                recs.append((url, ts.to_pydatetime(), b"", "application/octet-stream"))
            else:
                recs.append((url, ts.to_pydatetime(), bytes(html), "text/html"))
        blob = build_warc_segment(recs, f"segment-{int(pdf['seg'].iloc[0])}")
        return pd.DataFrame({"segment": [blob]})

    return (
        pages.select(
            "url", "warc_ts", "html",
            (F.crc32(F.col("url")) % n_segments).alias("seg"),
        )
        .groupBy("seg")
        .applyInPandas(_pack, schema="segment binary")
    )


def pages_from_warc(records):
    """WARC records → the engine's ``pages`` shape (url, warc_ts, html,
    text, lang): ``text/html`` payloads become the html column, anything
    else becomes a null-html row (the engine fetches it, marks it
    ``non_html``, and never expands it — exactly the corpus semantics).
    ``text``/``lang`` are null: the engine's crawl path never reads them
    (they exist for downstream curation, which recomputes text with the
    extract kernel anyway), and a WARC response carries neither."""
    from pyspark.sql import functions as F

    return records.select(
        "url",
        "warc_ts",
        F.when(
            F.col("content_type").startswith("text/html"), F.col("payload")
        ).alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def cdx_index(segments):
    """CDX-style URL index over WARC segments — the random-access map
    Common Crawl serves as its public URL index: fetching ONE page out of
    a 100 TB crawl is then a ranged read of ``length`` bytes at ``offset``
    in ``filename``, never a segment scan.  Input: a frame of
    ``(filename string, segment binary)`` rows (the binaryFile reader's
    ``path``/``content``); output: one row per response record
    ``(urlkey, url, warc_ts, filename, offset, length)`` where ``urlkey``
    is the SURT transform (``urlkit.surt_key_py`` — same function the
    Catalyst ``surt_keys`` gate query pins), so sorting the index clusters
    each domain's pages adjacently exactly as CDX files do.  One parse
    task per segment, zero shuffles; callers sort/partition the output as
    their serving layout requires."""
    import pandas as pd

    from ..functions.urlkit import surt_key_py

    def gen(batches):
        for pdf in batches:
            rows = []
            for fname, blob in zip(pdf["filename"], pdf["segment"]):
                for rec in parse_warc_segment(bytes(blob), with_offsets=True):
                    rows.append(
                        {
                            "urlkey": surt_key_py(rec["url"]),
                            "url": rec["url"],
                            "warc_ts": rec["warc_ts"],
                            "filename": fname,
                            "offset": rec["offset"],
                            "length": rec["length"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "urlkey", "url", "warc_ts", "filename", "offset", "length",
                ],
            )

    return segments.mapInPandas(
        gen,
        schema=(
            "urlkey string, url string, warc_ts timestamp, "
            "filename string, offset long, length long"
        ),
    )


def read_cdx_index(spark, path: str):
    """Index on-disk segments: binaryFile → (filename, segment) → cdx_index."""
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path)
    return cdx_index(
        files.select(
            F.col("path").alias("filename"), F.col("content").alias("segment")
        )
    )


def build_wet_record(url: str, ts: datetime, text: str) -> bytes:
    """One WET *conversion* record (the Common-Crawl extracted-text
    artifact): same WARC/1.0 framing as :func:`build_warc_record` but
    ``WARC-Type: conversion`` with a bare UTF-8 text body (no HTTP block —
    WET bodies are the extracted text itself, per the published format)."""
    payload = text.encode("utf-8")
    date = _warc_date(ts)
    rec_id = hashlib.sha256(f"wet\x00{url}\x00{date}".encode()).hexdigest()
    header = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: conversion" + _CRLF
        + f"WARC-Record-ID: <urn:sha256:{rec_id}>".encode() + _CRLF
        + f"WARC-Date: {date}".encode() + _CRLF
        + f"WARC-Target-URI: {url}".encode() + _CRLF
        + b"Content-Type: text/plain" + _CRLF
        + f"Content-Length: {len(payload)}".encode() + _CRLF
        + _CRLF
    )
    return header + payload + _CRLF + _CRLF


def parse_wet_segment(blob: bytes) -> list:
    """Scan a WET segment: one ``{url, warc_ts, text}`` per *conversion*
    record (same framing scan as :func:`parse_warc_segment`; warcinfo and
    any response records in a mixed blob are skipped)."""
    records = []
    pos = 0
    n = len(blob)
    while pos < n:
        head_end = blob.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError(f"unterminated WARC header block at offset {pos}")
        fields = {}
        lines = blob[pos:head_end].decode("utf-8").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"missing WARC version line at offset {pos}")
        for line in lines[1:]:
            key, _, value = line.partition(":")
            fields[key.strip().lower()] = value.strip()
        length = int(fields["content-length"])
        body_end = head_end + 4 + length
        if body_end + 4 > n or blob[body_end:body_end + 4] != _CRLF + _CRLF:
            raise ValueError(f"truncated/unterminated record at offset {pos}")
        if fields.get("warc-type") == "conversion":
            records.append(
                {
                    "url": fields["warc-target-uri"],
                    "warc_ts": datetime.strptime(
                        fields["warc-date"], _WARC_DATE_FMT
                    ),
                    "text": blob[head_end + 4:body_end].decode("utf-8"),
                }
            )
        pos = body_end + 4
    return records


def wet_segments_from_pages(pages, n_segments: int = 8):
    """pages → WET segments: the extraction kernel (``extract_text_udf`` —
    the same byte-identity-tested Arrow UDF the crawl pipeline uses) runs
    JVM-adjacent over the html column, then each segment task serializes
    its extracted texts as conversion records.  Null-html rows (non-HTML
    documents) produce no WET record, exactly as Common Crawl's WET files
    carry only extracted pages."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..functions.udfs import extract_text_udf

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("url")
        blob = b"".join(
            [build_warcinfo(f"wet-segment-{int(pdf['seg'].iloc[0])}")]
            + [
                build_wet_record(u, t.to_pydatetime(), x)
                for u, t, x in zip(pdf["url"], pdf["warc_ts"], pdf["text"])
            ]
        )
        return pd.DataFrame({"segment": [blob]})

    extracted = pages.filter(F.col("html").isNotNull()).select(
        "url",
        "warc_ts",
        extract_text_udf(F.col("html")).alias("text"),
        (F.crc32(F.col("url")) % n_segments).alias("seg"),
    )
    return extracted.groupBy("seg").applyInPandas(_pack, schema="segment binary")


def wet_records(segments):
    """Distributed WET parse: (segment binary) → (url, warc_ts, text)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["segment"]:
                rows.extend(parse_wet_segment(bytes(blob)))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "text"])

    return segments.mapInPandas(
        gen, schema="url string, warc_ts timestamp, text string"
    )

"""WARC serializer/parser semantics and the distributed read path."""

import os
from datetime import datetime

import pytest

from apollo_service_spark.sources.warc import (
    build_warc_record,
    build_warc_segment,
    build_warcinfo,
    parse_warc_segment,
    read_warc,
    warc_records,
)

TS = datetime(2020, 1, 1, 12, 34, 56)


def test_record_golden_bytes():
    """The serializer is deterministic down to the byte: same inputs, same
    record — including the sha256-derived record id (no clock, no RNG)."""
    a = build_warc_record("https://x.test/p", TS, b"<html>hi</html>")
    b = build_warc_record("https://x.test/p", TS, b"<html>hi</html>")
    assert a == b
    assert a.startswith(b"WARC/1.0\r\nWARC-Type: response\r\n")
    assert b"WARC-Target-URI: https://x.test/p\r\n" in a
    assert b"WARC-Date: 2020-01-01T12:34:56Z\r\n" in a
    assert a.endswith(b"<html>hi</html>\r\n\r\n")


def test_roundtrip_multi_record_and_warcinfo_skip():
    recs = [
        ("https://a.test/1", TS, "héllo".encode("utf-8")),
        ("https://a.test/2", TS, b"", "text/plain"),
        ("https://a.test/3", TS, b"\x00\x01binary\xff"),
    ]
    blob = build_warc_segment(recs, "seg-7")
    out = parse_warc_segment(blob)
    assert [r["url"] for r in out] == [u for u, _, *_ in recs]
    assert out[0]["payload"] == "héllo".encode("utf-8")
    assert out[1]["payload"] == b"" and out[1]["content_type"] == "text/plain"
    assert out[2]["payload"] == b"\x00\x01binary\xff"
    assert all(r["warc_ts"] == TS for r in out)
    # the warcinfo preamble parsed structurally but emitted no row
    assert len(out) == 3


def test_payload_may_contain_record_terminator_bytes():
    """Content-Length framing, not delimiter scanning: a payload that
    CONTAINS '\\r\\n\\r\\nWARC/1.0' must come back intact."""
    evil = b"x\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\ny"
    blob = build_warc_segment([("https://e.test/", TS, evil)])
    out = parse_warc_segment(blob)
    assert out[0]["payload"] == evil


def test_truncated_segment_raises():
    blob = build_warc_segment([("https://t.test/", TS, b"abcdef")])
    with pytest.raises(ValueError, match="truncated|terminator"):
        parse_warc_segment(blob[:-6])
    with pytest.raises(ValueError, match="unterminated"):
        parse_warc_segment(b"WARC/1.0\r\nWARC-Type: response")


def test_distributed_parse_and_disk_read(spark, tmp_path):
    segs = []
    expect = set()
    for s in range(3):
        recs = []
        for i in range(4):
            url = f"https://d.test/{s}/{i}"
            payload = f"seg {s} doc {i}".encode()
            recs.append((url, TS, payload))
            expect.add((url, payload))
        segs.append(build_warc_segment(recs, f"seg-{s}"))
        with open(os.path.join(tmp_path, f"part-{s}.warc"), "wb") as fh:
            fh.write(segs[-1])

    df = spark.createDataFrame([(s,) for s in segs], "segment binary")
    got = {
        (r["url"], bytes(r["payload"])) for r in warc_records(df).collect()
    }
    assert got == expect

    from_disk = {
        (r["url"], bytes(r["payload"]))
        for r in read_warc(spark, str(tmp_path)).collect()
    }
    assert from_disk == expect


def test_engine_crawls_warc_backed_pages(spark, tmp_path):
    """The capstone: serialize the crawl corpus to on-disk WARC segments,
    read them back through binaryFile → parse → pages, and run the FULL
    frontier engine over the WARC-backed table — the crawl log must equal
    the parquet-backed run exactly (url, iteration, rank).  This is the
    Common-Crawl deployment shape: the engine crawling directly over
    segment files, no intermediate table materialization."""
    from apollo_service_spark.operators.frontier import (
        CrawlConfig,
        FrontierEngine,
        crawl_log_df,
    )
    from apollo_service_spark.sources.corpus import corpus_to_spark, gen_corpus
    from apollo_service_spark.sources.storage import SnapshotStore
    from apollo_service_spark.sources.warc import (
        pages_from_warc,
        segments_from_pages,
    )

    corpus = corpus_to_spark(spark, gen_corpus(n_hosts=3, n_pages=60, seed=7))
    warc_dir = tmp_path / "segments"
    os.makedirs(warc_dir)
    blobs = segments_from_pages(corpus["pages"], n_segments=4).collect()
    assert len(blobs) == 4
    for i, row in enumerate(blobs):
        with open(warc_dir / f"part-{i}.warc", "wb") as fh:
            fh.write(bytes(row["segment"]))

    pages_warc = pages_from_warc(read_warc(spark, str(warc_dir)))
    # the round trip preserves the null/non-null html split exactly
    orig = corpus["pages"]
    assert pages_warc.filter("html IS NULL").count() == orig.filter(
        "html IS NULL"
    ).count()
    assert pages_warc.count() == orig.count()

    def run(pages, path):
        store = SnapshotStore(str(path))
        FrontierEngine(
            spark, pages, store, CrawlConfig(),
            robots=corpus["robots"], politeness=corpus["politeness"],
        ).run(seeds=corpus["seeds"])
        return {
            (r["url"], r["iteration"], r["rank"])
            for r in crawl_log_df(spark, store)
            .select("url", "iteration", "rank")
            .collect()
        }

    assert run(pages_warc, tmp_path / "warc_run") == run(
        orig, tmp_path / "parquet_run"
    )


def test_cdx_index_random_access(spark, tmp_path):
    """Every CDX index row must support ranged random access: slicing
    exactly (offset, length) bytes out of the segment file and parsing
    THAT slice alone yields the record, byte-identical payload — the
    one-page-from-100TB read path Common Crawl's URL index serves.  The
    urlkey column is the SURT transform, so the sorted index clusters
    each domain's pages adjacently."""
    from apollo_service_spark.functions.urlkit import surt_key_py
    from apollo_service_spark.sources.warc import read_cdx_index

    blobs = {}
    for s in range(2):
        recs = [
            (f"https://h{i % 3}.test/s{s}/p{i}", TS, f"payload {s}/{i}".encode())
            for i in range(5)
        ]
        blob = build_warc_segment(recs, f"seg-{s}")
        path = os.path.join(tmp_path, f"part-{s}.warc")
        with open(path, "wb") as fh:
            fh.write(blob)
        blobs[f"part-{s}.warc"] = blob

    index = read_cdx_index(spark, str(tmp_path)).collect()
    assert len(index) == 10
    full = {
        (name, r["url"]): r["payload"]
        for name, blob in blobs.items()
        for r in parse_warc_segment(blob)
    }
    for row in index:
        name = row["filename"].rsplit("/", 1)[-1]
        sliced = blobs[name][row["offset"]: row["offset"] + row["length"]]
        recs = parse_warc_segment(sliced)
        assert len(recs) == 1
        assert recs[0]["url"] == row["url"]
        assert recs[0]["payload"] == full[(name, row["url"])]
        assert row["urlkey"] == surt_key_py(row["url"])
    # SURT ordering clusters domains: all h0 keys sort before all h1 keys
    keys = sorted(r["urlkey"] for r in index)
    hosts_in_order = [k.split(")")[0] for k in keys]
    assert hosts_in_order == sorted(hosts_in_order)


def test_wet_roundtrip_byte_identical_extraction(spark, tmp_path):
    """WET (the Common-Crawl extracted-text artifact): pages → extraction
    kernel → conversion records → parse must give EXACTLY the text the
    in-repo extractor produces per url (the BASELINE byte-identity
    invariant, carried through serialization).  Null-html document rows
    produce no WET record, matching the published format."""
    from apollo_service_spark.functions.html import extract_text_only
    from apollo_service_spark.sources.corpus import corpus_to_spark, gen_corpus
    from apollo_service_spark.sources.warc import (
        wet_records,
        wet_segments_from_pages,
    )

    corpus = gen_corpus(n_hosts=3, n_pages=40, seed=5)
    sdf = corpus_to_spark(spark, corpus)
    segs = wet_segments_from_pages(sdf["pages"], n_segments=3)
    got = {
        r["url"]: r["text"] for r in wet_records(segs).collect()
    }
    pages_pd = corpus["pages"]
    html_rows = pages_pd[pages_pd["html"].notna()]
    assert len(got) == len(html_rows)
    for _, row in html_rows.iterrows():
        assert got[row["url"]] == extract_text_only(row["html"]), row["url"]
    # non-HTML rows produced no record
    assert set(got) == set(html_rows["url"])


def test_gzip_segment_roundtrip_and_compressed_cdx_offsets():
    """The real Common-Crawl layout: .warc.gz with one gzip member per
    record. Parsing the compressed blob must equal parsing the plain one,
    and with_offsets must report COMPRESSED-domain member extents — slicing
    (offset, length) out of the .warc.gz bytes yields a standalone gzip
    member that parses to the byte-identical record (real CDX semantics)."""
    recs = [
        (f"https://gz.test/{i}", TS, f"payload-{i}".encode() * (i + 1))
        for i in range(4)
    ]
    plain = build_warc_segment(recs, "gz-seg")
    gz = build_warc_segment(recs, "gz-seg", compress=True)
    assert gz[:2] == b"\x1f\x8b" and gz != plain

    a = parse_warc_segment(plain)
    b = parse_warc_segment(gz)
    assert [(r["url"], r["payload"]) for r in a] == [
        (r["url"], r["payload"]) for r in b
    ]

    indexed = parse_warc_segment(gz, with_offsets=True)
    # offsets tile the compressed blob: warcinfo member + 4 record members
    assert indexed[0]["offset"] > 0  # warcinfo member precedes
    for rec in indexed:
        member = gz[rec["offset"]: rec["offset"] + rec["length"]]
        assert member[:2] == b"\x1f\x8b"
        got = parse_warc_segment(member)
        assert len(got) == 1
        assert got[0]["url"] == rec["url"]
        assert got[0]["payload"] == rec["payload"]
    # truncation fails loudly in the compressed domain too
    with pytest.raises(ValueError, match="gzip"):
        parse_warc_segment(gz[:-4])


def test_read_warc_handles_gz_files_transparently(spark, tmp_path):
    recs = [(f"https://mix.test/{i}", TS, f"p{i}".encode()) for i in range(3)]
    with open(os.path.join(tmp_path, "a.warc"), "wb") as fh:
        fh.write(build_warc_segment(recs[:2], "a"))
    with open(os.path.join(tmp_path, "b.warc.gz"), "wb") as fh:
        fh.write(build_warc_segment(recs[2:], "b", compress=True))
    got = {
        (r["url"], bytes(r["payload"]))
        for r in read_warc(spark, str(tmp_path)).collect()
    }
    assert got == {(u, p) for u, _, p in recs}

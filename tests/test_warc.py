"""WARC/1.0 source: from-scratch Common-Crawl ingest (ISO 28500).

Reference scope note: the reference consumes already-extracted page
bytes; WARC is the crawl wire format that FEEDS the pages table the
north rule names, so the parser lives on the Spark side as a source.
"""

import datetime as dt

import pytest

from docling_spark import warc


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    warc.write_synthetic_warc(d / "gz", n_records=24)
    warc.write_synthetic_warc(d / "plain", n_records=24, compress=False)
    return d


class TestParse:
    def test_gz_member_per_record(self, archive):
        data = (archive / "gz" / "part-0000.warc.gz").read_bytes()
        rows, n_rec, n_skip = warc.parse_warc(data, "f")
        assert n_rec == 24 and n_skip == 0
        # 24 records, i%5 in {3,4} are request/metadata -> 15 responses
        assert len(rows) == 15
        r0 = rows[0]
        assert r0["url"] == "https://warc.test/0/0"
        assert r0["warc_ts"] == dt.datetime(2024, 3, 1, 0, 0, 0)
        # HTTP head stripped: payload starts at the html body
        assert r0["html"].startswith(b"<html><body><h1>doc 0</h1>")
        assert r0["warc_type"] == "response"

    def test_plain_equals_gz(self, archive):
        gz = warc.parse_warc(
            (archive / "gz" / "part-0000.warc.gz").read_bytes(), "f")[0]
        pl = warc.parse_warc(
            (archive / "plain" / "part-0000.warc").read_bytes(), "f")[0]
        assert gz == pl

    def test_truncated_archive_never_raises(self, archive):
        data = (archive / "gz" / "part-0000.warc.gz").read_bytes()
        full = warc.parse_warc(data, "f")[0]
        for cut in (1, 10, len(data) // 3, len(data) - 5):
            rows, _, _ = warc.parse_warc(data[:cut], "f")
            assert len(rows) <= len(full)
            assert all(r in full for r in rows)

    def test_garbage_and_missing_headers(self):
        assert warc.parse_warc(b"not a warc at all", "f")[0] == []
        # record with no Content-Length is rejected, not fatal
        bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://x/\r\n"
               b"WARC-Date: 2024-03-01T00:00:00Z\r\n\r\nbody\r\n\r\n")
        rows, n_rec, n_skip = warc.parse_warc(bad, "f")
        assert rows == []


class TestSpark:
    def test_read_warc_pages_shape(self, spark, archive):
        import __spark_entry__ as entrymod
        entrymod._ensure_shipped(spark)
        df = warc.read_warc(spark, str(archive / "gz"))
        rows = {r.url: r for r in df.collect()}
        assert len(rows) == 15
        r = rows["https://warc.test/0/0"]
        assert bytes(r.html).startswith(b"<html><body><h1>doc 0</h1>")
        assert r.warc_ts == dt.datetime(2024, 3, 1, 0, 0, 0)
        assert set(df.columns) >= {"url", "warc_ts", "html", "text",
                                   "lang"}

    def test_ingest_chains_into_extraction(self, spark, archive):
        """WARC -> pages shape -> the extraction engine, end-to-end."""
        import __spark_entry__ as entrymod
        from docling_spark import engine
        entrymod._ensure_shipped(spark)
        pages = warc.read_warc(spark, str(archive / "gz")) \
            .select("url", "html")
        res = engine.extract_pages(pages, repartition=False)
        got = {r.url: r for r in res.collect()}
        assert len(got) == 15
        assert all(r.status == "success" for r in got.values())
        assert got["https://warc.test/0/0"].md.startswith("# doc 0")


class TestCdxIndex:
    def test_offsets_enable_random_access(self, archive):
        """The CDX contract: range-reading record_length bytes at
        record_offset and gunzipping ONE member must yield exactly that
        record - proven here for every response record."""
        import gzip
        data = (archive / "gz" / "part-0000.warc.gz").read_bytes()
        rows, _, _ = warc.parse_warc(data, "f", with_offsets=True)
        assert rows
        for r in rows:
            member = data[r["record_offset"]:
                          r["record_offset"] + r["record_length"]]
            rec = gzip.decompress(member)
            assert rec.startswith(b"WARC/1.0\r\n")
            assert f"WARC-Target-URI: {r['url']}".encode() in rec
            assert r["html"] in rec

    def test_plain_offsets_slice_records(self, archive):
        data = (archive / "plain" / "part-0000.warc").read_bytes()
        rows, _, _ = warc.parse_warc(data, "f", with_offsets=True)
        for r in rows:
            rec = data[r["record_offset"]:
                       r["record_offset"] + r["record_length"]]
            assert rec.startswith(b"WARC/1.0\r\n")
            assert r["html"] in rec

    def test_cdx_spark(self, spark, archive):
        import __spark_entry__ as entrymod
        entrymod._ensure_shipped(spark)
        idx = {r.url: r
               for r in warc.cdx_index(spark,
                                       str(archive / "gz")).collect()}
        assert len(idx) == 15
        offs = sorted(r.record_offset for r in idx.values())
        assert offs[0] >= 0 and offs == sorted(set(offs))


def test_crawl_pipeline_funnel(spark):
    """The composed WARC->policy->boilerplate->extract->quality->dedup
    DAG: monotone non-increasing funnel with pinned stage counts."""
    import __spark_entry__ as entrymod
    df = entrymod.queries()["crawl_pipeline"](spark, "/root/testdata/sf0.001")
    got = {r.stage: r.n_rows for r in df.collect()}
    assert got == {
        "1_ingested": 30,          # 48 records, 30 responses
        "2_policy_allowed": 27,    # /3/ path prefix denied
        "3_non_boilerplate": 27,
        "4_extracted_ok": 27,
        "5_quality_pass": 20,      # short docs fail the word-count gate
        "6_deduped": 20,
    }
    vals = [got[k] for k in sorted(got)]
    assert vals == sorted(vals, reverse=True)


def test_ingest_metrics_counts(spark, archive):
    import __spark_entry__ as entrymod
    entrymod._ensure_shipped(spark)
    rows = warc.ingest_metrics(spark, str(archive / "gz")).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.source_file == "part-0000.warc.gz"
    assert r.n_records == 24 and r.n_responses == 15 and r.n_skipped == 0


def test_parse_warc_total_on_bit_flips(archive):
    """Dispatch totality: single-bit corruption anywhere in the archive
    must never raise - records after an undecodable member are lost (gz
    framing), records before it still parse."""
    data = bytearray((archive / "gz" / "part-0000.warc.gz").read_bytes())
    import random
    rng = random.Random(11)
    full, _, _ = warc.parse_warc(bytes(data), "f")
    for _ in range(64):
        i = rng.randrange(len(data))
        flipped = bytearray(data)
        flipped[i] ^= 1 << rng.randrange(8)
        rows, n_rec, n_skip = warc.parse_warc(bytes(flipped), "f")
        assert isinstance(rows, list) and len(rows) <= len(full)


class TestHttpMessage:
    """Real-crawl HTTP message shapes: LF-only header framing, chunked
    transfer coding, gzip/deflate content coding, fractional WARC-Date."""

    def _wrap(self, payload, ts="2024-03-01T00:00:00Z"):
        rec = warc._record(b"response", "https://x.test/p", ts, payload)
        rows, n_rec, n_skip = warc.parse_warc(rec, "f")
        return rows, n_skip

    def test_fractional_seconds_warc_date(self):
        rows, n_skip = self._wrap(
            b"HTTP/1.1 200 OK\r\n\r\n<html>f</html>",
            ts="2024-03-01T00:00:00.123456Z")
        assert n_skip == 0 and len(rows) == 1
        assert rows[0]["warc_ts"] == dt.datetime(2024, 3, 1, 0, 0, 0,
                                                 123456)

    def test_lf_only_header_framing(self):
        rows, n_skip = self._wrap(
            b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n<html>lf</html>")
        assert n_skip == 0
        assert rows[0]["html"] == b"<html>lf</html>"

    def test_chunked_transfer_coding(self):
        body = b"5\r\n<html\r\n8\r\n>chunked\r\n7\r\n</html>\r\n0\r\n\r\n"
        rows, _ = self._wrap(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body)
        assert rows[0]["html"] == b"<html>chunked</html>"

    def test_gzip_content_coding(self):
        import gzip as _gz
        page = b"<html><body>gz body</body></html>"
        rows, _ = self._wrap(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
            + _gz.compress(page))
        assert rows[0]["html"] == page

    def test_deflate_content_coding(self):
        import zlib as _zl
        page = b"<html>deflate</html>"
        # raw deflate (the historically common, header-free variant)
        raw = _zl.compressobj(wbits=-15)
        body = raw.compress(page) + raw.flush()
        rows, _ = self._wrap(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + body)
        assert rows[0]["html"] == page

    def test_chunked_then_gzip_stack(self):
        import gzip as _gz
        page = b"<html>stacked</html>"
        gz = _gz.compress(page)
        chunked = (hex(len(gz))[2:].encode() + b"\r\n" + gz
                   + b"\r\n0\r\n\r\n")
        rows, _ = self._wrap(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
            b"Content-Encoding: gzip\r\n\r\n" + chunked)
        assert rows[0]["html"] == page

    def test_invalid_codings_keep_raw_bytes(self):
        """An undecodable layer degrades to raw bytes, never raises."""
        rows, _ = self._wrap(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip")
        assert rows[0]["html"] == b"not-gzip"
        rows, _ = self._wrap(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZ\r\nx")
        assert rows[0]["html"] == b"ZZ\r\nx"


def test_gunzip_members_linear_memcpy(archive):
    """The member walk must not copy the remaining archive per member:
    build an archive with many small members and check wall time stays
    far below the quadratic regime (the pre-fix cost for 2k members of
    a 2 MB archive was ~2k * 1 MB memcpy)."""
    import io as _io
    import gzip as _gz
    import time
    buf = _io.BytesIO()
    rec = warc._record(b"response", "https://x.test/p",
                       "2024-03-01T00:00:00Z",
                       b"HTTP/1.1 200 OK\r\n\r\n<html>m</html>")
    one = _gz.compress(rec)
    n = 4000
    data = one * n
    t0 = time.monotonic()
    rows, n_rec, n_skip = warc.parse_warc(data, "f")
    elapsed = time.monotonic() - t0
    assert n_rec == n and len(rows) == n and n_skip == 0
    # linear walk of ~1 MB with 4k members finishes in well under a
    # second; the quadratic version took tens of seconds
    assert elapsed < 5.0

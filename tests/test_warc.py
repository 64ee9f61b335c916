"""operators.warc — WARC record framing (q149 is the oracle twin)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mb8600_clickhouse_spark.operators import warc


class TestParseWarcBytes:
    def test_roundtrip_two_records(self):
        payload = warc.encode_warcinfo("software: test") + warc.encode_warc_response(
            "https://a.example/p/1", "<html>hi</html>"
        )
        recs = warc.parse_warc_bytes(payload)
        assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
        assert recs[0]["status"] is None
        assert recs[1]["url"] == "https://a.example/p/1"
        assert recs[1]["status"] == 200
        assert recs[1]["body"] == "<html>hi</html>"

    def test_body_containing_version_line_is_not_split(self):
        # length-directed framing: a body that CONTAINS 'WARC/1.0' must
        # stay one record (the reason the parser never regex-splits)
        evil = "this body mentions WARC/1.0\r\nWARC-Type: response\r\n inside"
        payload = warc.encode_warc_response("https://x/", evil) + warc.encode_warcinfo()
        recs = warc.parse_warc_bytes(payload)
        assert len(recs) == 2
        assert recs[0]["body"] == evil
        assert recs[1]["warc_type"] == "warcinfo"

    def test_non_ok_status_and_reason(self):
        recs = warc.parse_warc_bytes(
            warc.encode_warc_response("https://x/", "gone", 404, "Not Found")
        )
        assert recs[0]["status"] == 404 and recs[0]["body"] == "gone"

    def test_truncated_record_raises(self):
        good = warc.encode_warc_response("https://x/", "abcdef")
        with pytest.raises(ValueError, match="truncated"):
            warc.parse_warc_bytes(good[:-10])

    def test_missing_content_length_raises(self):
        bad = b"WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\nbody"
        with pytest.raises(ValueError, match="Content-Length"):
            warc.parse_warc_bytes(bad)

    def test_empty_payload_yields_nothing(self):
        assert warc.parse_warc_bytes(b"") == []

    def test_warc_1_1_parses(self):
        # ISO 28500:2017 revision shares the 1.0 frame layout
        payload = warc.encode_warc_response("https://a/", "hello").replace(
            b"WARC/1.0", b"WARC/1.1", 1
        )
        recs = warc.parse_warc_bytes(payload)
        assert len(recs) == 1 and recs[0]["body"] == "hello"

    def test_unsupported_version_raises(self):
        payload = warc.encode_warcinfo().replace(b"WARC/1.0", b"WARC/2.0", 1)
        with pytest.raises(ValueError, match="unsupported WARC version"):
            warc.parse_warc_bytes(payload)


class TestParseWarcSpark:
    def test_explodes_records_per_doc(self, spark):
        p1 = warc.encode_warcinfo() + warc.encode_warc_response("https://a/", "x")
        p2 = warc.encode_warc_response("https://b/", "y")
        df = spark.createDataFrame(
            [Row(doc_id=1, payload=bytearray(p1)), Row(doc_id=2, payload=bytearray(p2))]
        )
        got = sorted(
            (r["doc_id"], r["rec_idx"], r["warc_type"], r["url"])
            for r in warc.parse_warc(df).collect()
        )
        assert got == [
            (1, 0, "warcinfo", ""),
            (1, 1, "response", "https://a/"),
            (2, 0, "response", "https://b/"),
        ]


class TestWarcRoundtripProperty:
    """Property: arbitrary record sequences (random URLs, statuses,
    bodies — including bodies containing WARC framing text and CRLFs)
    survive encode → parse_warc_bytes exactly."""

    def test_roundtrip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        body = st.text(
            alphabet=st.sampled_from(list("abc \r\n") + ["W"]),
            max_size=40,
        )
        rec = st.tuples(
            st.sampled_from(["https://a/", "https://b/p?q=1", ""]),
            st.sampled_from([200, 301, 404, 503]),
            body,
        )

        @settings(max_examples=25, deadline=None)
        @given(recs=st.lists(rec, min_size=0, max_size=5))
        def check(recs):
            payload = b"".join(
                warc.encode_warc_response(u, b, s, "R") for u, s, b in recs
            )
            parsed = warc.parse_warc_bytes(payload)
            assert len(parsed) == len(recs)
            for (u, s, b), p in zip(recs, parsed):
                assert p["warc_type"] == "response"
                assert p["url"] == u
                assert p["status"] == s
                assert p["body"] == b

        check()

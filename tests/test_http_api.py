"""HTTP shim over the 4 serving endpoints: routes -> api.py plan builders ->
JSON, on a stdlib threaded server (the executable form of the reference's
Flask API.py:28-75 mapping documented in README)."""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import Row

from soict20221_bigdata_financialplatform_spark.http_api import serve_background


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read().decode())


def test_http_shim_serves_all_four_endpoints(spark):
    bars = spark.createDataFrame(
        [Row(symbol=s, date=f"2024-01-{d:02d}", close=float(10 * i + d))
         for i, s in enumerate(["AAA", "BBB"]) for d in range(1, 6)]
    )
    ticks = spark.createDataFrame(
        [Row(symbol="AAA", time="2024-01-05 10:00:00", price=1.0),
         Row(symbol="AAA", time="2024-01-05 10:00:05", price=2.0)]
    )
    news = spark.createDataFrame(
        [Row(title="t1", time="2024-01-01", body="old"),
         Row(title="t1", time="2024-01-02", body="new"),  # upsert-by-title
         Row(title="t2", time="2024-01-03", body="x")]
    )
    srv, port = serve_background(bars, ticks, news)
    try:
        st, olhc = _get(port, "/OLHC/AAA/3")
        assert st == 200
        assert [r["date"] for r in olhc] == ["2024-01-05", "2024-01-04", "2024-01-03"]
        assert all(r["symbol"] == "AAA" for r in olhc)

        st, rt = _get(port, "/realtime/AAA")
        assert st == 200 and len(rt) == 1 and rt[0]["price"] == 2.0

        st, nw = _get(port, "/news")
        assert st == 200
        assert {(r["title"], r["body"]) for r in nw} == {("t1", "new"), ("t2", "x")}

        st, info = _get(port, "/info/BBB")
        assert st == 200 and len(info) == 5
        assert info[0]["date"] == "2024-01-05"  # newest first

        # unknown route -> 404 (server keeps serving)
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=30)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        st, again = _get(port, "/realtime/AAA")
        assert st == 200 and len(again) == 1
    finally:
        srv.shutdown()

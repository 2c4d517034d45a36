"""read_parquet over HTTP — the reference's demo model shape
(reference: examples/basic/source_orders.sql:2 reads an https parquet).
Served from a real local HTTP server to exercise the fetch+cache path
end to end."""

import http.server
import shutil
import socketserver
import threading

import pytest

from arnab_spark.dialect import _REMOTE_CACHE, transpile_statement


@pytest.fixture()
def http_root(tmp_path):
    shutil.copy("/root/testdata/sf0.001/region.parquet", tmp_path / "region.parquet")
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(tmp_path), **kw
    )
    with socketserver.TCPServer(("127.0.0.1", 0), handler) as httpd:
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}"
        httpd.shutdown()


def test_http_read_parquet_model(spark, http_root):
    shutil.rmtree(_REMOTE_CACHE, ignore_errors=True)
    sql = transpile_statement(
        f"SELECT count() AS n FROM read_parquet('{http_root}/region.parquet')"
    )
    assert "parquet.`/tmp/arnab_spark_remote_cache/" in sql and "count(*)" in sql
    assert spark.sql(sql).collect()[0].n == 5
    # second transpile hits the cache (no new fetch needed — same path)
    sql2 = transpile_statement(
        f"SELECT count() AS n FROM read_parquet('{http_root}/region.parquet')"
    )
    assert sql2 == sql

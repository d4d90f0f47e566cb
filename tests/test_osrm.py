"""Live OSRM client against a local http.server mock: URL shape,
sentinel handling, and the distributed per-partition fetch feeding the
isochrone operators end-to-end."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from gpd_lite_toolbox_spark.sources.osrm import (
    OSRM_UNREACHABLE,
    osrm_table_times,
    osrm_table_url,
    osrm_times_distributed,
)


class _MockOSRM(BaseHTTPRequestHandler):
    """Deterministic durations: 10 * round(dest_lon) + round(dest_lat);
    a dest with lon < 0 is unroutable (null duration)."""

    def do_GET(self):  # noqa: N802 (http.server API)
        u = urlparse(self.path)
        assert u.path.startswith("/table/v1/driving/")
        q = parse_qs(u.query)
        assert q["sources"] == ["0"] and q["annotations"] == ["duration"]
        # NB: urlparse shunts ';'-separated parts of the last path
        # segment into .params — parse coords from the raw path
        raw_path = self.path.split("?", 1)[0]
        coords = [
            tuple(float(c) for c in p.split(","))
            for p in raw_path.rsplit("/", 1)[1].split(";")
        ]
        row = [0.0] + [
            None if lon < 0 else 10.0 * round(lon) + round(lat)
            for lon, lat in coords[1:]
        ]
        body = json.dumps({"code": "Ok", "durations": [row]}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def mock_osrm():
    srv = HTTPServer(("127.0.0.1", 0), _MockOSRM)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_table_url_shape():
    url = osrm_table_url("http://h/", (1.0, 2.0), [(3.0, 4.0)])
    assert url == (
        "http://h/table/v1/driving/1.000000,2.000000;3.000000,4.000000"
        "?sources=0&annotations=duration"
    )


def test_table_times_and_unreachable_sentinel(mock_osrm):
    times = osrm_table_times(
        mock_osrm, (0.0, 0.0), [(3.0, 4.0), (-1.0, 0.0), (7.0, 1.0)]
    )
    assert times == [34.0, float(OSRM_UNREACHABLE), 71.0]


def test_distributed_fetch_matches_driver_side(spark, mock_osrm):
    pts = spark.createDataFrame(
        [(i, float(i % 10), float(i % 7)) for i in range(40)],
        "pt_id long, x double, y double",
    ).repartition(4)
    out = osrm_times_distributed(
        pts, mock_osrm, origin=(0.0, 0.0), batch_size=6
    ).toPandas().sort_values("pt_id", ignore_index=True)
    assert len(out) == 40
    for _, r in out.iterrows():
        assert r.time_s == 10.0 * round(r.x) + round(r.y)


def test_distributed_output_feeds_isochrone(spark, mock_osrm):
    from gpd_lite_toolbox_spark.operators.isochrone import filter_osrm_times

    pts = spark.createDataFrame(
        [(1, 2.0, 3.0), (2, -1.0, 0.0), (3, 0.0, 0.0)],
        "pt_id long, x double, y double",
    )
    m = osrm_times_distributed(pts, mock_osrm, origin=(9.0, 9.0))
    kept = filter_osrm_times(m).toPandas()
    # unreachable (pt 2) and zero-duration (pt 3) sentinels both drop
    assert sorted(kept["pt_id"]) == [1]


def test_osrm_to_isochrone_end_to_end(spark, mock_osrm):
    """The reference's #17 pipeline with a LIVE (mocked) OSRM service:
    grid points -> distributed /table fetch -> sentinel filter ->
    banded isochrone aggregation. Closes the loop the fixture-matrix
    queries mock at the data layer."""
    from gpd_lite_toolbox_spark.operators.isochrone import isochrone_bands

    pts = spark.createDataFrame(
        [(i, float(i % 13), float(i % 11)) for i in range(200)],
        "pt_id long, x double, y double",
    )
    matrix = osrm_times_distributed(
        pts, mock_osrm, origin=(0.0, 0.0), batch_size=50
    )
    bands = isochrone_bands(matrix, height=4.0, interval_h=0.005).toPandas()
    assert len(bands) > 1               # multiple travel-time bands
    kept = bands.n_pts.sum()
    # mock: time 10*round(x)+round(y); zero-duration (0,0)-ish points
    # are sentinel-dropped, everything else lands in exactly one band
    assert 0 < kept < 200
    assert (bands.n_pts > 0).all()

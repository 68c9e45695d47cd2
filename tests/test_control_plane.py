"""REST control-plane shim (reference O-13, app/app.py HTTP contract)."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

from kinesis_dstream_spark.streaming.control import StreamingJobRegistry
from kinesis_dstream_spark.streaming.rest import ControlPlaneServer

API_KEY = "test-key-123"


def _req(port, path, method="POST", body=None, key=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        method=method,
        data=json.dumps(body).encode() if body is not None else None,
    )
    req.add_header("Content-Type", "application/json")
    if key:
        req.add_header("x-api-key", key)
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def server(spark):
    def rate_job():
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 100)
            .load()
            .writeStream.format("memory")
            .queryName("cp_rate_job")
            .outputMode("append")
            .start()
        )

    srv = ControlPlaneServer(
        StreamingJobRegistry(spark), {"rate_job": rate_job}, api_key=API_KEY
    ).start()
    yield srv
    try:
        srv.registry.stop("rate_job")
    except Exception:
        pass
    srv.shutdown()


def test_health_needs_no_auth(server):
    code, body = _req(server.port, "/", method="GET")
    assert code == 200 and body == {"message": "Server up and running"}


def test_auth_contract_matches_reference(server):
    """Same 401 messages as the reference's authorize decorator
    (app/app.py:40-51): missing header vs wrong key are distinct."""
    code, body = _req(server.port, "/check", body={})
    assert code == 401 and body == {"message": "Must provide x-api-key:token"}
    code, body = _req(server.port, "/check", body={}, key="wrong")
    assert code == 401 and body == {"message": "Invalid API KEY"}


def test_payload_validation(server):
    code, body = _req(server.port, "/start", key=API_KEY)
    assert code == 400 and "payload" in body["message"]
    code, body = _req(server.port, "/start", body={}, key=API_KEY)
    assert code == 400 and body == {"message": "Must provide job_name"}
    code, _ = _req(server.port, "/start", body={"job_name": "nope"}, key=API_KEY)
    assert code == 404


def test_start_check_stop_lifecycle(server, spark):
    code, body = _req(
        server.port, "/start", body={"job_name": "rate_job"}, key=API_KEY
    )
    assert code == 200 and body["active"]

    # double start: 409, not a duplicate poller (unlike the reference)
    code, body = _req(
        server.port, "/start", body={"job_name": "rate_job"}, key=API_KEY
    )
    assert code == 409 and "already active" in body["message"]

    code, body = _req(
        server.port, "/check", body={"job_name": "rate_job"}, key=API_KEY
    )
    assert code == 200 and body["current_status"]["active"]
    code, body = _req(server.port, "/check", body={}, key=API_KEY)
    assert [s["name"] for s in body["current_status"]] == ["rate_job"]

    deadline = time.time() + 60
    while time.time() < deadline and spark.table("cp_rate_job").count() == 0:
        time.sleep(0.2)
    assert spark.table("cp_rate_job").count() > 0  # the job really ran

    code, body = _req(
        server.port, "/stop", body={"job_name": "rate_job"}, key=API_KEY
    )
    assert code == 200 and body == {"name": "rate_job", "active": False}

    code, body = _req(
        server.port, "/stop", body={"job_name": "missing"}, key=API_KEY
    )
    assert code == 404

"""End-to-end pipeline + capability API (reference task.ts parity)."""

from __future__ import annotations

import json

import pytest

from etl_drone_sense_spark import pipeline as P
from etl_drone_sense_spark.config import Environment
from etl_drone_sense_spark.schemas import DRONE_LOCATION_SCHEMA

PAYLOAD = [
    {
        "id": "d1",
        "callSign": "CS1",
        "missionName": "m",
        "model": "M1",
        "latitude": 10.0,
        "longitude": 20.0,
        "lastUpdate": 1.7e9,
        "altitudeAgl": 100.0,
        "altitudeMsl": 200.0,
        "speed": 5.0,
        "heading": 90.0,
        "spoiLat": 11.0,
        "spoiLng": 21.0,
        "sensors": [
            {"id": "s1", "name": "cam", "video_url": "http://v", "rtsp_url": "rtsp://r"}
        ],
    },
    {
        "id": "d2",
        "callSign": "CS2",
        "missionName": "m",
        "model": "M1",
        "latitude": -5.0,
        "longitude": 3.0,
        "lastUpdate": 1.7e9,
        "altitudeAgl": 50.0,
        "altitudeMsl": 70.0,
        "speed": 2.0,
        "heading": 10.0,
        "spoiLat": 0.0,
        "spoiLng": 0.0,
        "sensors": [],
    },
]


def test_run_ingest_end_to_end(spark, tmp_path):
    from tests.helpers import CapturePoster, read_bodies

    feats = P.run_ingest(
        spark,
        env=Environment(DroneSenseToken="t", DEBUG=False),
        payload=PAYLOAD,
        post=CapturePoster(tmp_path),
        batch_size=10,
    )
    rows = {r["id"]: r.asDict(recursive=True) for r in feats.collect()}
    assert rows["d1"]["properties"]["video"]["url"] == "rtsp://r"
    assert rows["d2"]["properties"]["video"] is None

    docs = [json.loads(b) for b in read_bodies(tmp_path)]
    assert sum(len(d["features"]) for d in docs) == 2
    assert all(d["type"] == "FeatureCollection" for d in docs)


def test_handler_env_configured_submit(spark, tmp_path, monkeypatch):
    """The scheduled entry point resolves ETL_API/ETL_LAYER from env
    (reference task.ts:221-223, README.md:14-22) and submits executor-side
    through RestPoster."""
    from tests.helpers import CaptureTransport, read_bodies

    monkeypatch.setenv("ETL_API", "http://etl.local")
    monkeypatch.setenv("ETL_LAYER", "19")
    out = P.handler(
        spark=spark, payload=PAYLOAD, transport=CaptureTransport(tmp_path)
    )
    assert out["layer"] == "19"
    assert out["features"] == 2
    posts = [json.loads(b) for b in read_bodies(tmp_path)]
    assert all(p["url"] == "http://etl.local/api/layer/19/cot" for p in posts)
    assert sum(len(json.loads(p["body"])["features"]) for p in posts) == 2


def test_handler_requires_endpoint_env(spark, monkeypatch):
    from etl_drone_sense_spark.config import ConfigError

    monkeypatch.delenv("ETL_API", raising=False)
    monkeypatch.delenv("ETL_LAYER", raising=False)
    with pytest.raises(ConfigError):
        P.handler(spark=spark, payload=PAYLOAD)


def test_capability_schema_api():
    assert P.schema("input", "incoming") == P.ENVIRONMENT_SCHEMA
    assert P.schema("output", "incoming") == DRONE_LOCATION_SCHEMA
    assert P.schema("input", "outgoing").fields == []  # task.ts:99-101
    with pytest.raises(ValueError):
        P.schema("bogus", "incoming")

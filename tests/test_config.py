"""Config loader tests (A18/A19; reference common.py:33-81)."""

from __future__ import annotations

import logging

from mqtt_influx_storage_service_spark.config import (
    ServiceConfig,
    configure_logging,
)


def test_ini_roundtrip(tmp_path):
    conf = tmp_path / "service.conf"
    conf.write_text(
        "[DEFAULT]\n"
        "service_id = svc42\n"
        "publish_stats_interval = 120\n"
        "mqtt_host = broker.example\n"
    )
    cfg = ServiceConfig.load(str(conf))
    assert cfg.get("MQTT_HOST") == "broker.example"  # case-insensitive
    assert cfg.get("missing", "dflt") == "dflt"
    assert cfg.stats_interval_s == 120
    assert cfg.events_topic == "openchirp/service/svc42/thing/events"
    assert cfg.status_topic == "openchirp/service/svc42/status"
    assert cfg.data_topic_prefix == "openchirp/device/"


def test_defaults_without_keys(tmp_path):
    conf = tmp_path / "empty.conf"
    conf.write_text("[DEFAULT]\n")
    cfg = ServiceConfig.load(str(conf))
    assert cfg.stats_interval_s == 600  # PUBLISH_STATS_INTERVAL default
    assert cfg.events_topic == "openchirp/service/service/thing/events"


def test_configure_logging_levels(tmp_path):
    log = tmp_path / "svc.log"
    configure_logging(verbosity=4, logfile=str(log))
    logging.getLogger("t").info("hello-info")
    for h in logging.getLogger().handlers:
        h.flush()
    assert "hello-info" in log.read_text()
    configure_logging(verbosity=1)  # restore quiet


def test_tune_warns_on_readonly_conf(caplog):
    """tune() must surface conf keys it could not apply (VERDICT r2 #5):
    a silently-missing conf (e.g. nanosAsLong) changes query semantics."""
    from mqtt_influx_storage_service_spark.session import tune

    class _Conf:
        def __init__(self):
            self.applied = {}

        def get(self, key, default=None):
            return default

        def set(self, key, value):
            if key == "spark.sql.session.timeZone":
                raise RuntimeError("Cannot modify the value of a static config")
            self.applied[key] = value

    class _Ctx:
        defaultParallelism = 8

    class _Spark:
        conf = _Conf()
        sparkContext = _Ctx()

    fake = _Spark()
    with caplog.at_level(logging.WARNING, logger="mqtt_influx_storage_service_spark.session"):
        tune(fake)
    msgs = [r.message for r in caplog.records if "tune()" in r.message]
    assert msgs and "spark.sql.session.timeZone" in msgs[0]
    # the other keys still applied despite the failure
    assert fake.conf.applied["spark.sql.adaptive.enabled"] == "true"

"""Service configuration (reference: common.py:33-52, service.conf).

The reference loads a flat INI ``[DEFAULT]`` section into a string
dict (``common.py:44-52``) and derives topics/URLs/credentials from it
(``influx_service.py:387-392``). Same shape here, plus typed access
and the derived MQTT topic set so the streaming entrypoints take one
object instead of six strings. Logging setup (A19, common.py:54-81)
maps to standard ``logging`` here / log4j on executors — Spark owns
executor-side logging, so only the driver-side config knob is exposed.
"""

from __future__ import annotations

import configparser
import logging
from dataclasses import dataclass, field


@dataclass
class ServiceConfig:
    """Flat key/value config with typed accessors (all values are
    strings in the INI, as in the reference)."""

    values: dict[str, str] = field(default_factory=dict)

    @classmethod
    def load(cls, path: str) -> "ServiceConfig":
        parser = configparser.ConfigParser()
        with open(path) as fh:
            parser.read_file(fh)
        return cls(dict(parser["DEFAULT"]))

    def get(self, key: str, default: str | None = None) -> str | None:
        return self.values.get(key.lower(), default)

    def get_int(self, key: str, default: int) -> int:
        v = self.get(key)
        return int(v) if v is not None else default

    # the reference's derived topic grammar (influx_service.py:387-390)
    @property
    def data_topic_prefix(self) -> str:
        return "openchirp/device/"

    @property
    def events_topic(self) -> str:
        sid = self.get("service_id", "service")
        return f"openchirp/service/{sid}/thing/events"

    @property
    def status_topic(self) -> str:
        sid = self.get("service_id", "service")
        return f"openchirp/service/{sid}/status"

    @property
    def stats_interval_s(self) -> int:
        # PUBLISH_STATS_INTERVAL=600 (influx_service.py:382)
        return self.get_int("publish_stats_interval", 600)


def configure_logging(verbosity: int = 3, logfile: str | None = None) -> None:
    """A19 (common.py:54-81): verbosity 1-6 → level, optional file +
    stdout handlers. Executor logs are log4j's concern."""
    levels = [
        logging.CRITICAL, logging.ERROR, logging.WARNING,
        logging.INFO, logging.DEBUG, logging.NOTSET,
    ]
    level = levels[max(0, min(verbosity - 1, len(levels) - 1))]
    handlers: list[logging.Handler] = [logging.StreamHandler()]
    if logfile:
        handlers.append(logging.FileHandler(logfile))
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        handlers=handlers,
        force=True,
    )

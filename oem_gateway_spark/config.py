"""Gateway configuration: the reference's ConfigObj settings tree as typed
dataclasses + a file watcher with restart-on-change semantics.

Ref (SURVEY §1.4, §3.3): oemgateway.conf has [gateway] loglevel,
[listeners] name -> {type + init/runtime settings}, [buffers] name ->
{type, domain, path, apikey, active, ...}; OemGatewayFileInterface
re-reads each tick and OemGateway._update_settings hot-applies diffs
(create/destroy/reconfigure components by class-name string).

Engine mapping: Spark streaming queries are restarted (cheaply, from
checkpoints) instead of hot-mutated — restart-on-change is semantically
identical to the reference's apply-on-change because offsets resume
exactly where the old query stopped.  INI parsing uses stdlib
configparser (ConfigObj-compatible enough for the reference's flat
sections; values stay strings exactly like ConfigObj — including the
reference's quirky ``active == 'False'`` string compare, which we
normalize here once, properly).
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, field


def _parse_bool(s: str | bool) -> bool:
    """ConfigObj hands back strings; the reference compares ``== 'False'``
    (P8).  Normalize the usual spellings; unknown -> True (ref default)."""
    if isinstance(s, bool):
        return s
    return s.strip().lower() not in ("false", "0", "no", "off")


@dataclass(frozen=True)
class ListenerConfig:
    name: str
    type: str = "socket"  # socket | serial_frames | file
    host: str = "localhost"
    port: int = 5555
    path: str = ""
    # RFM2Pi radio runtime settings (C3): written to the device by the
    # connector, not data-plane ops.
    frequency: str = ""
    group: str = ""
    baseid: str = ""
    rfm2pi: bool = False


@dataclass(frozen=True)
class BufferConfig:
    name: str
    type: str = "emoncms"
    domain: str = "localhost"
    path: str = "/emoncms"
    apikey: str = ""
    protocol: str = "http://"
    active: bool = True


@dataclass(frozen=True)
class GatewayConfig:
    loglevel: str = "WARN"
    listeners: dict[str, ListenerConfig] = field(default_factory=dict)
    buffers: dict[str, BufferConfig] = field(default_factory=dict)
    trigger_ms: int = 200  # ref main-loop tick (B6): 0.2 s
    checkpoint_root: str = ""


def load_config(path: str) -> GatewayConfig:
    """Parse an oemgateway.conf-style INI file into a GatewayConfig."""
    cp = configparser.ConfigParser()
    cp.read(path)
    listeners: dict[str, ListenerConfig] = {}
    buffers: dict[str, BufferConfig] = {}
    for section in cp.sections():
        if section.startswith("listener:"):
            name = section.split(":", 1)[1]
            s = cp[section]
            listeners[name] = ListenerConfig(
                name=name,
                type=s.get("type", "socket"),
                host=s.get("host", "localhost"),
                port=int(s.get("port", "5555")),
                path=s.get("path", ""),
                frequency=s.get("frequency", ""),
                group=s.get("group", ""),
                baseid=s.get("baseid", ""),
                rfm2pi=_parse_bool(s.get("rfm2pi", "False")),
            )
        elif section.startswith("buffer:"):
            name = section.split(":", 1)[1]
            s = cp[section]
            buffers[name] = BufferConfig(
                name=name,
                type=s.get("type", "emoncms"),
                domain=s.get("domain", "localhost"),
                path=s.get("path", "/emoncms"),
                apikey=s.get("apikey", ""),
                protocol=s.get("protocol", "http://"),
                active=_parse_bool(s.get("active", "True")),
            )
    g = cp["gateway"] if cp.has_section("gateway") else {}
    return GatewayConfig(
        loglevel=g.get("loglevel", "WARN"),
        listeners=listeners,
        buffers=buffers,
        trigger_ms=int(g.get("trigger_ms", "200")),
        checkpoint_root=g.get("checkpoint_root", ""),
    )


class ConfigWatcher:
    """S4: detect config-file changes by mtime + content (the reference
    re-parses each tick; we re-parse only when the file changed)."""

    def __init__(self, path: str):
        self.path = path
        self._mtime: float = -1.0
        self._config: GatewayConfig | None = None

    def check(self) -> GatewayConfig | None:
        """Return the new config if it changed since last check, else None."""
        try:
            mtime = os.stat(self.path).st_mtime
        except FileNotFoundError:
            return None
        if mtime == self._mtime:
            return None
        self._mtime = mtime
        cfg = load_config(self.path)
        if cfg == self._config:
            return None
        self._config = cfg
        return cfg

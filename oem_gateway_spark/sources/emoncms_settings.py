"""S5: emoncms-GUI settings interface — the reference's second settings
source, polling a local emoncms for gateway configuration.

Ref: oemgateway.py :: OemGatewayEmoncmsInterface (~l.250-330) [L confidence]:
poll ``http://localhost/emoncms/raspberrypi/get.json``, map GUI fields
(radio frequency/group/baseid, remote domain/apikey, send-to-remote flag)
into the same settings tree the file interface produces.

Engine mapping: a config PROVIDER — it emits GatewayConfig; the pipeline
lifecycle (restart_from_config) is identical to the file path.  Transport
is injectable; the reference's exact field names are low-confidence, so the
mapping below is explicit and unit-tested against a fake payload.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from oem_gateway_spark.config import BufferConfig, GatewayConfig, ListenerConfig

Getter = Callable[[str], str]  # url -> body


def _default_getter(url: str, timeout_s: float = 10.0) -> str:
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
        return resp.read().decode("utf-8", errors="replace")


class EmoncmsSettingsInterface:
    """Polls the emoncms raspberrypi module and produces a GatewayConfig."""

    def __init__(
        self,
        base_url: str = "http://localhost/emoncms",
        getter: Getter | None = None,
    ):
        self.base_url = base_url
        self.getter = getter or _default_getter
        self._last: GatewayConfig | None = None

    def fetch(self) -> GatewayConfig:
        body = self.getter(f"{self.base_url}/raspberrypi/get.json")
        gui = json.loads(body)
        listeners = {
            "rfm2pi": ListenerConfig(
                name="rfm2pi",
                type="serial_frames",
                path="/dev/ttyAMA0",
                frequency=str(gui.get("frequency", "4")),
                group=str(gui.get("sgroup", "210")),
                baseid=str(gui.get("baseid", "15")),
                rfm2pi=True,
            )
        }
        buffers: dict[str, BufferConfig] = {
            "local": BufferConfig(
                name="local",
                domain="localhost",
                path="/emoncms",
                apikey=str(gui.get("apikey", "")),
            )
        }
        if str(gui.get("remotesend", "")) in ("1", "true", "True"):
            buffers["remote"] = BufferConfig(
                name="remote",
                domain=str(gui.get("remotedomain", "emoncms.org")),
                path=str(gui.get("remotepath", "")),
                apikey=str(gui.get("remoteapikey", "")),
            )
        return GatewayConfig(listeners=listeners, buffers=buffers)

    def check_settings(self) -> GatewayConfig | None:
        """The reference's per-tick changed-bit contract: returns the new
        config when it differs from the last poll, else None."""
        cfg = self.fetch()
        if cfg == self._last:
            return None
        self._last = cfg
        return cfg

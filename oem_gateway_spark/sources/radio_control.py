"""RFM2Pi radio control channel (reference C3/C4): the out-of-band command
writes the serial connector performs, separated from the data plane.

Ref (SURVEY §2.5):
  C3 `OemGatewayRFM2PiListener.set (~l.180-200)`: on settings change write
     "<val>b" (frequency code 4=433/8=868/9=915 MHz), "<val>g" (network
     group), "<val>i" (base node id) to the serial port.
  C4 `run/_send_time (~l.205-220)`: every `sendtimeinterval` seconds write
     "00,%02d,%02d,00,s" (hour, minute) — emonGLCD clock sync broadcast.

Engine mapping: a control sidecar owned by the serial connector (driver
side, not a Spark job) — commands are written to the device transport; in
tests, to a file.  Command GRAMMAR is pure functions, unit-testable.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass

VALID_FREQ_CODES = ("4", "8", "9")  # 433 / 868 / 915 MHz


def frequency_command(code: str) -> str:
    """C3: '<val>b' — e.g. '8b' retunes to 868 MHz."""
    if code not in VALID_FREQ_CODES:
        raise ValueError(f"frequency code {code!r} not in {VALID_FREQ_CODES}")
    return f"{code}b"


def group_command(group: int) -> str:
    """C3: '<val>g' — RFM12 network group (0-250)."""
    if not 0 <= group <= 250:
        raise ValueError(f"group {group} out of range 0-250")
    return f"{group}g"


def baseid_command(baseid: int) -> str:
    """C3: '<val>i' — base node id (1-30)."""
    if not 1 <= baseid <= 30:
        raise ValueError(f"baseid {baseid} out of range 1-30")
    return f"{baseid}i"


def time_broadcast_command(hour: int, minute: int) -> str:
    """C4: '00,HH,MM,00,s' — emonGLCD time sync frame."""
    return "00,%02d,%02d,00,s" % (hour, minute)


@dataclass
class RadioControl:
    """Applies radio runtime settings and periodic time broadcasts through
    an injectable transport (the reference wrote to pyserial)."""

    write: Callable[[str], None]
    sendtimeinterval: float = 0.0  # 0 = disabled, like the reference default
    clock: Callable[[], float] = time.time
    _last_time_sent: float = 0.0

    def apply_settings(
        self,
        frequency: str | None = None,
        group: int | None = None,
        baseid: int | None = None,
    ) -> list[str]:
        """C3 hot-apply: emit a command per changed setting; returns them."""
        sent = []
        if frequency is not None:
            sent.append(frequency_command(frequency))
        if group is not None:
            sent.append(group_command(group))
        if baseid is not None:
            sent.append(baseid_command(baseid))
        for cmd in sent:
            self.write(cmd)
        return sent

    def tick(self) -> str | None:
        """C4: called periodically (the connector's timer); writes the time
        broadcast when the interval elapsed."""
        if self.sendtimeinterval <= 0:
            return None
        now = self.clock()
        if now - self._last_time_sent < self.sendtimeinterval:
            return None
        self._last_time_sent = now
        lt = time.localtime(now)
        cmd = time_broadcast_command(lt.tm_hour, lt.tm_min)
        self.write(cmd)
        return cmd

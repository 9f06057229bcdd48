"""S2 socket listener e2e (real TCP server), S5 emoncms settings interface,
and property-based fuzz of the frame classifier."""

from __future__ import annotations

import os
import shutil
import socket
import threading
import time

import pytest

SCRATCH = "/root/repo/.scratch"


@pytest.fixture()
def scratch(request):
    d = os.path.join(SCRATCH, request.node.name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_socket_listener_end_to_end(spark, scratch):
    """S2: a real TCP server feeds newline-delimited frames to the built-in
    socket source; the parse chain runs on a live micro-batch stream."""
    from oem_gateway_spark.functions import frames as FR
    from oem_gateway_spark.sources import socket_frame_stream

    frames = ["10 822 1021 1", "> info", "11 5 6", "10 8a2"]
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.listen(1)

    def serve():
        conn, _ = server.accept()
        with conn:
            conn.sendall(("\n".join(frames) + "\n").encode())
            time.sleep(8)  # keep the connection open while Spark polls

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    stream = socket_frame_stream(spark, "127.0.0.1", port)
    parsed = FR.parse_serial_frames(stream)
    q = (
        parsed.writeStream.format("memory")
        .queryName("socket_e2e")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        got = []
        while time.time() < deadline:
            got = spark.table("socket_e2e").collect()
            if len(got) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
        server.close()
    by_node = {r["node"]: list(r["values"]) for r in got}
    assert by_node == {10: [822.0, 1021.0, 1.0], 11: [5.0, 6.0]}
    assert all(r["ingest_ts"] is not None for r in got)  # P7 arrival stamp


def test_emoncms_settings_interface():
    """S5: GUI JSON -> GatewayConfig mapping + changed-bit contract."""
    import json

    from oem_gateway_spark.sources.emoncms_settings import EmoncmsSettingsInterface

    payload = {
        "frequency": "8",
        "sgroup": "210",
        "baseid": "15",
        "apikey": "localkey",
        "remotesend": "1",
        "remotedomain": "emoncms.org",
        "remotepath": "/emoncms",
        "remoteapikey": "remotekey",
    }
    urls = []

    def fake_get(url: str) -> str:
        urls.append(url)
        return json.dumps(payload)

    iface = EmoncmsSettingsInterface(getter=fake_get)
    cfg = iface.check_settings()
    assert cfg is not None
    assert urls == ["http://localhost/emoncms/raspberrypi/get.json"]
    assert cfg.listeners["rfm2pi"].frequency == "8"
    assert cfg.listeners["rfm2pi"].rfm2pi is True
    assert cfg.buffers["local"].apikey == "localkey"
    assert cfg.buffers["remote"].domain == "emoncms.org"
    assert cfg.buffers["remote"].apikey == "remotekey"

    # unchanged -> None; changed -> new config (C2 contract)
    assert iface.check_settings() is None
    payload["remotesend"] = "0"
    cfg2 = iface.check_settings()
    assert cfg2 is not None and "remote" not in cfg2.buffers


def test_classifier_fuzz_model_based():
    """Property test: the vectorized classifier agrees with a direct
    python transcription of the reference's rules on random frame lines."""
    import math
    import random

    import pandas as pd

    from oem_gateway_spark.functions import frames as FR
    from oem_gateway_spark.functions.frames_pandas import _classify_batch

    rng = random.Random(42)
    tokens = [
        "10", "0", "255", "256", "-1", "32768", "7.5", "-3.25", "1e2",
        "8a2", "x", ">", "?", "nan", "inf", "1_0", "5.", ".5", "+7",
    ]

    def model(line: str, rfm2pi: bool) -> str:
        s = line.strip()
        if s == "":
            return FR.REASON_EMPTY
        t = s.split()
        if t[0].startswith(">") or t[0].startswith("?"):
            return FR.REASON_INFO
        for x in t:
            if "_" in x:
                return FR.REASON_NON_NUMERIC
            try:
                v = float(x)
            except ValueError:
                return FR.REASON_NON_NUMERIC
            if math.isnan(v) or math.isinf(v):
                return FR.REASON_NON_NUMERIC
        if len(t) < 2:
            return FR.REASON_NO_VALUES
        if rfm2pi:
            try:
                int(t[0])
            except ValueError:
                return FR.REASON_NON_NUMERIC
            for x in t[1:]:
                try:
                    v = int(x)
                except ValueError:
                    return FR.REASON_BYTE_RANGE
                if not 0 <= v <= 255:
                    return FR.REASON_BYTE_RANGE
            if (len(t) - 1) % 2 != 0:
                return FR.REASON_ODD_PARITY
        return FR.VALID

    lines = []
    for _ in range(500):
        n = rng.randint(0, 6)
        sep = " " if rng.random() < 0.8 else "  "
        lines.append(sep.join(rng.choice(tokens) for _ in range(n)))
    for rfm2pi in (False, True):
        got, _ = _classify_batch(pd.Series(lines), rfm2pi=rfm2pi)
        expected = [model(ln, rfm2pi) for ln in lines]
        mismatches = [
            (ln, e, g) for ln, e, g in zip(lines, expected, got) if e != g
        ]
        assert not mismatches, mismatches[:5]

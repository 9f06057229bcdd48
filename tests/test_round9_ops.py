"""Round-9 additions: ADVICE regression tests + new operator pins.

Non-Spark tests first (atomic_export protocol) so the file stays cheap
to run in isolation; Spark-backed pins use the shared session fixture.
"""

import os

import pytest

from oem_gateway_spark.suite.streaming_batch import atomic_export


def _touch(path: str, content: str = "x") -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def test_atomic_export_skips_build_when_done(tmp_path):
    final = str(tmp_path / "export")
    _touch(os.path.join(final, "done.marker"))
    calls = []
    atomic_export(lambda tmp: calls.append(tmp), final, "done.marker")
    assert calls == []  # complete dir short-circuits the build


def test_atomic_export_evicts_stale_partial_dir(tmp_path):
    """r8 ADVICE (medium): a pre-existing partial dir at final_dir (no
    done marker — e.g. left by a crashed in-place writer) made the
    rename fail with ENOTEMPTY and was then silently trusted forever.
    Now the stale dir is evicted and the rename retried."""
    final = str(tmp_path / "export")
    _touch(os.path.join(final, "partial.artifact"))  # stale, no marker

    def build(tmp):
        _touch(os.path.join(tmp, "real.artifact"))
        _touch(os.path.join(tmp, "done.marker"))

    out = atomic_export(build, final, "done.marker")
    assert out == final
    assert os.path.exists(os.path.join(final, "done.marker"))
    assert os.path.exists(os.path.join(final, "real.artifact"))
    assert not os.path.exists(os.path.join(final, "partial.artifact"))


def test_atomic_export_trusts_concurrent_winner(tmp_path, monkeypatch):
    """Rename failure WITH the done marker present is the legitimate
    lost-race case: the winner's dir must be left untouched and the
    loser's tmp discarded."""
    final = str(tmp_path / "export")

    def build(tmp):
        # Simulate the race: the "winner" lands a complete dir at
        # final_dir after this process started building.
        _touch(os.path.join(final, "done.marker"), "winner")
        _touch(os.path.join(tmp, "done.marker"), "loser")

    out = atomic_export(build, final, "done.marker")
    assert out == final
    with open(os.path.join(final, "done.marker")) as f:
        assert f.read() == "winner"
    leftovers = [p for p in os.listdir(tmp_path) if p.startswith("export.tmp")]
    assert leftovers == []

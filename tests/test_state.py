"""Offset/watermark state store (S4/ST2)."""

from __future__ import annotations

import json

from engine.ops.state import LocalJsonStateStore, default_state


def test_defaults_when_missing(tmp_path):
    store = LocalJsonStateStore(str(tmp_path / "nope" / "state.json"))
    assert store.get() == default_state()
    assert store.get()["creation_dt"].startswith("2020-01-01")


def test_set_get_round_trip(tmp_path):
    p = tmp_path / "s.json"
    store = LocalJsonStateStore(str(p))
    st = default_state()
    st["creation_dt"] = "2024-06-01 12:00:00"
    store.set(st)
    assert store.get() == st
    # atomic write: file is valid json at all times
    assert json.loads(p.read_text())["creation_dt"] == "2024-06-01 12:00:00"


def test_overwrite_keeps_other_keys(tmp_path):
    store = LocalJsonStateStore(str(tmp_path / "s.json"))
    st = store.get()
    st["update_dt"] = "2025-01-01 00:00:00"
    store.set(st)
    st2 = store.get()
    assert st2["update_dt"] == "2025-01-01 00:00:00"
    assert st2["deletion_date"] == default_state()["deletion_date"]

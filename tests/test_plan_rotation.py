"""Unit bindings for the r10 rotation-planner machinery (MUST_PIN /
DEFERRED / mandatory-first window fill) — pure Python over synthetic
evidence, no Spark session."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")


@pytest.fixture()
def rot(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SKIP_SESSION", "1")
    monkeypatch.syspath_prepend(_TOOLS)
    spec = importlib.util.spec_from_file_location(
        "plan_rotation_under_test", os.path.join(_TOOLS, "plan_rotation.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_evidence(monkeypatch, rot, latest: dict[str, int], cur: int):
    monkeypatch.setattr(rot, "latest_green", lambda: (latest, cur))


def test_due_must_pins_respects_due_round_and_satisfaction(rot, monkeypatch):
    monkeypatch.setattr(
        rot,
        "MUST_PIN",
        {
            "a": (10, "due now, unsatisfied"),
            "b": (10, "satisfied by a post-due green"),
            "c": (11, "not due yet"),
            "d": (10, "not registered"),
        },
    )
    latest = {"b": 10}
    due = rot._due_must_pins(["a", "b", "c"], latest, cur=9)
    assert due == ["a"]


def test_propose_mandatory_first_crowds_out_standing_pins(rot, monkeypatch):
    """43 aged + pins > WINDOW: the age-mandatory rows must all stay
    in-window; standing pins yield."""
    monkeypatch.setattr(rot, "WINDOW", 6)
    monkeypatch.setattr(rot, "MAX_AGE", 3)
    monkeypatch.setattr(rot, "PINNED", ["p1", "p2"])
    monkeypatch.setattr(rot, "MUST_PIN", {"m1": (10, "semantics changed")})
    monkeypatch.setattr(rot, "DEFERRED", {"n2": (10, "deferred this round")})
    registry = ["m1", "n1", "n2", "a1", "a2", "a3", "a4", "p1", "p2", "f1"]
    latest = {
        "m1": 8, "a1": 6, "a2": 6, "a3": 6, "a4": 6,
        "p1": 8, "p2": 9, "f1": 8,
    }
    _fake_evidence(monkeypatch, rot, latest, cur=9)
    pinned, never, aged = rot.propose(registry)
    window = set(pinned) | set(never) | set(aged)
    # mandatory: m1 (due must-pin), n1 (never, undeferred), a1-a4 (age 3)
    assert {"m1", "n1", "a1", "a2", "a3", "a4"} <= window
    assert "n2" not in window          # validly deferred
    assert len(window) <= 6            # standing pins crowded out
    assert "p1" not in window and "p2" not in window


def test_propose_fills_standing_pins_when_room(rot, monkeypatch):
    monkeypatch.setattr(rot, "WINDOW", 5)
    monkeypatch.setattr(rot, "MAX_AGE", 3)
    monkeypatch.setattr(rot, "PINNED", ["p1"])
    monkeypatch.setattr(rot, "MUST_PIN", {})
    monkeypatch.setattr(rot, "DEFERRED", {})
    registry = ["n1", "a1", "p1", "f1", "f2"]
    _fake_evidence(
        monkeypatch, rot, {"a1": 6, "p1": 8, "f1": 7, "f2": 9}, cur=9
    )
    pinned, never, aged = rot.propose(registry)
    assert never == ["n1"]
    assert "p1" in pinned
    assert "a1" in aged            # age-3 mandatory
    assert "f1" in aged            # oldest remaining fills the window
    assert len(set(pinned) | set(never) | set(aged)) == 5


def test_expired_deferral_becomes_mandatory(rot, monkeypatch):
    """A deferral granted for round 10 no longer excuses the query when
    round 11 is being planned — it lands back in the never block."""
    monkeypatch.setattr(rot, "WINDOW", 4)
    monkeypatch.setattr(rot, "PINNED", [])
    monkeypatch.setattr(rot, "MUST_PIN", {})
    monkeypatch.setattr(rot, "DEFERRED", {"n1": (10, "deferred in r10")})
    registry = ["n1", "f1"]
    _fake_evidence(monkeypatch, rot, {"f1": 10}, cur=10)
    _pinned, never, _aged = rot.propose(registry)
    assert "n1" in never

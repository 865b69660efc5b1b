"""Smoke tests for the examples/ scripts (tiny shapes, CPU)."""

import pathlib
import sys

import pytest


def test_inverse_rendering_example(tmp_path, monkeypatch, capsys):
    root = pathlib.Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(root / "examples"))
    try:
        import inverse_rendering
    finally:
        sys.path.pop(0)
    out = tmp_path / "rec.png"
    monkeypatch.setattr(sys, "argv", [
        "inverse_rendering.py", "--size", "32", "--spp", "2",
        "--steps", "6", "--lr", "0.1", "--out", str(out),
        "--metrics", str(tmp_path / "m.jsonl"),
    ])
    inverse_rendering.main()
    assert out.exists()
    assert (tmp_path / "m.jsonl").read_text().count("train_step") >= 1


def test_envmap_recovery_example(tmp_path, monkeypatch):
    root = pathlib.Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(root / "examples"))
    try:
        import envmap_recovery
    finally:
        sys.path.pop(0)
    out = tmp_path / "env.png"
    monkeypatch.setattr(sys, "argv", [
        "envmap_recovery.py", "--size", "32", "--spp", "2",
        "--steps", "4", "--env", "8", "16", "--out", str(out),
    ])
    envmap_recovery.main()
    assert out.exists()

"""Profile store + dynamic profile rules."""

import os
import types

from art_tpu.profiles import (DynamicRule, ProfileStore, default_params_for,
                              get_store, load_dynamic_rules)


def test_bundled_profiles_listed():
    names = get_store().list_profiles()
    assert "Neutral" in names
    assert "Standard Film Curve" in names
    assert "Auto-Matched Curve" in names


def test_resolve_and_load():
    store = get_store()
    pp = store.load("Standard Film Curve")
    assert pp.tone_curve.enabled
    assert len(pp.tone_curve.curve) > 3


def test_user_dir_overrides(tmp_path, monkeypatch):
    udir = tmp_path / "profiles"
    udir.mkdir()
    (udir / "Mine.arp").write_text(
        "[Version]\nVersion=1024\n\n[Saturation]\nEnabled=true\n"
        "Saturation=30\n")
    monkeypatch.setenv("ART_TPU_CONFIG", str(tmp_path))
    store = ProfileStore()
    pp = store.load("Mine")
    assert pp.saturation.enabled and pp.saturation.saturation == 30


def test_dynamic_rules_parse_and_match(tmp_path, monkeypatch):
    cfg = tmp_path / "dynamicprofile.cfg"
    cfg.write_text(
        "[rule 1]\niso_min=50\niso_max=200\nprofilepath=Punchy\n\n"
        "[rule 2]\niso_min=1600\niso_max=51200\ncamera_enabled=true\n"
        "camera_value=re:nikon\nprofilepath=Neutral\n")
    rules = load_dynamic_rules(str(cfg))
    assert len(rules) == 2
    assert rules[0].matches({"iso": 100})
    assert not rules[0].matches({"iso": 800})
    assert rules[1].matches({"iso": 3200, "camera": "Nikon Z8"})
    assert not rules[1].matches({"iso": 3200, "camera": "Canon R5"})

    frame = types.SimpleNamespace(iso=100, exif={}, make="X", model="Y")
    pp = default_params_for(frame, rules_path=str(cfg))
    assert pp.tone_curve.contrast == 25  # Punchy applied

    frame2 = types.SimpleNamespace(iso=800, exif={}, make="X", model="Y")
    pp2 = default_params_for(frame2, rules_path=str(cfg))
    assert pp2.tone_curve.contrast == 0  # no rule fires -> Neutral

"""YAML rule loading — ConfigLoader parity.

Reference semantics preserved (src/config_loader.py:75-98):
- each file ``config/rules/<type>_rules.yml`` holds a top-level
  ``<type>_rules:`` list of rule dicts;
- rules with ``enabled: false`` are filtered out at load time;
- checkers read optional fields with ``.get()`` defaults, so new YAML
  keys never require code changes (user-extension surface, SURVEY §2.10).

The graft adds ``quality_rules.yml`` — the flagship pipeline's verdict
thresholds — compiled into the ``thresholds`` dict that
``quality_pipeline`` consumes.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import yaml

DEFAULT_CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "config")


def load_rules(config_dir: Optional[str] = None) -> dict[str, list[dict]]:
    """{check_type: [enabled rule dicts]} from config/rules/*.yml."""
    config_dir = config_dir or DEFAULT_CONFIG_DIR
    rules_dir = os.path.join(config_dir, "rules")
    out: dict[str, list[dict]] = {}
    if not os.path.isdir(rules_dir):
        return out
    for fname in sorted(os.listdir(rules_dir)):
        if not (fname.endswith(".yml") or fname.endswith(".yaml")):
            continue
        with open(os.path.join(rules_dir, fname)) as fh:
            doc = yaml.safe_load(fh) or {}
        for key, rules in doc.items():
            if not key.endswith("_rules") or not isinstance(rules, list):
                continue
            ctype = key[: -len("_rules")]
            # enabled-filter parity (config_loader.py:97-98)
            out.setdefault(ctype, []).extend(
                r for r in rules if r.get("enabled", True)
            )
    return out


def quality_thresholds(config_dir: Optional[str] = None) -> dict[str, Any]:
    """Compile quality_rules.yml into quality_pipeline threshold overrides."""
    rules = load_rules(config_dir).get("quality", [])
    key_map = {
        "min_chars": "min_chars",
        "max_chars": "max_chars",
        "max_line_len": "max_line_len",
        "min_alpha_ratio": "min_alpha_ratio",
        "max_ppl": "max_ppl",
        "min_mismatch_conf": "min_mismatch_conf",
        "known_langs": "known_langs",
    }
    thresholds: dict[str, Any] = {}
    for rule in rules:
        for yaml_key, kw in key_map.items():
            if yaml_key in rule:
                v = rule[yaml_key]
                thresholds[kw] = tuple(v) if isinstance(v, list) else v
    return thresholds

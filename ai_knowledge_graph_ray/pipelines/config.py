"""TOML config loader (S2, reference ``config.py:5-20``).

Same sections as the reference's ``config.toml`` (``llm``,
``chunking``, ``standardization``, ``inference``) plus our
``runtime``; missing file -> None, like the reference. Uses stdlib
``tomllib`` (the reference pins the ``tomli`` backport; identical
parse)."""

from __future__ import annotations

import tomllib


def load_config(config_file: str = "config.toml") -> dict | None:
    try:
        with open(config_file, "rb") as f:
            return tomllib.load(f)
    except Exception:
        return None

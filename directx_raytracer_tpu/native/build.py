"""Build + bind the native runtime library (placeholder until parser.cpp lands)."""

from __future__ import annotations


def get_library():
    return None


def parse_scene(lib, path: str):
    return None

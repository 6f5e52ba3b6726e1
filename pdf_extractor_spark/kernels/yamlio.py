"""YAML/JSON envelope interchange (S7/S8 yaml halves).

Byte-level twins of the reference's file handlers
(/root/reference/src/utils/file_handler.py): ``write_yaml`` dumps with
``default_flow_style=False`` (:88-98), ``read_yaml`` is ``safe_load``
(:46-58); ``write_json`` uses ``indent=2`` (:61-72). The markdown
converter consumes exactly these files (markdown_converter.py:525-540),
so matching the dump style keeps the interchange files
byte-compatible with the reference's.

PyYAML is gated behind an import-try: when absent, YAML round-trips
raise ``YamlUnavailableError`` and the JSON half still works (the
reference's primary interchange degrades the same way a missing
optional dep does elsewhere in this repo).
"""

from __future__ import annotations

import json
from typing import Any, Dict

try:
    import yaml
    _HAVE_YAML = True
except ImportError:  # pragma: no cover - container ships PyYAML
    _HAVE_YAML = False


class YamlUnavailableError(RuntimeError):
    """Raised when YAML interchange is requested without PyYAML."""


def yaml_available() -> bool:
    return _HAVE_YAML


def envelope_to_yaml(data: Dict[str, Any]) -> str:
    """Serialize an output envelope as the reference writes it
    (file_handler.py:88-98: ``yaml.dump(default_flow_style=False)``)."""
    if not _HAVE_YAML:
        raise YamlUnavailableError("PyYAML not installed")
    return yaml.dump(data, default_flow_style=False)


def yaml_to_envelope(text: str) -> Dict[str, Any]:
    """Parse a YAML envelope (file_handler.py:46-58 ``safe_load``)."""
    if not _HAVE_YAML:
        raise YamlUnavailableError("PyYAML not installed")
    return yaml.safe_load(text)


def envelope_to_json(data: Dict[str, Any]) -> str:
    """Serialize as the reference's ``write_json`` (file_handler.py:
    61-72: ``json.dumps(indent=2)``)."""
    return json.dumps(data, indent=2)


def json_to_envelope(text: str) -> Dict[str, Any]:
    return json.loads(text)


SERIALIZERS = {
    "yaml": (envelope_to_yaml, yaml_to_envelope),
    "json": (envelope_to_json, json_to_envelope),
}

"""Config source (SURVEY §2.1 S6).

The reference loads `config.properties` from the classpath
(reference scala/…/utils/PropertiesReaderUtils.scala:15-20,
resources/config.properties:1-4 — kafka/redis hosts). Same contract
here: a tiny java-.properties-subset parser with no dependencies.
"""

from __future__ import annotations

from pathlib import Path


def load_properties(path: str | Path) -> dict[str, str]:
    """Parse `key=value` lines; `#`/`!` comment lines and blanks are
    skipped; whitespace around keys/values is trimmed (the subset of
    java.util.Properties the reference's config file uses)."""
    props: dict[str, str] = {}
    for raw in Path(path).read_text(encoding="utf-8").splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", "!")):
            continue
        if "=" not in line:
            raise ValueError(f"malformed properties line: {raw!r}")
        key, _, value = line.partition("=")
        props[key.strip()] = value.strip()
    return props

#!/usr/bin/env python
"""Byte-identity fingerprint of the extraction kernel over the bench corpus.

Usage: python scripts/kernel_identity.py [N_DOCS] [--out FILE]

Hashes EVERY output field of ``extract_document`` over the deterministic
corpus (pages.build_page, seed 42) into one sha256.  Run before and after
a kernel optimization: equal digests prove behavior preservation on the
full archetype mix (the same gate the pytest goldens apply, but over
20k docs instead of fixtures).
"""
from __future__ import annotations

import hashlib
import json
import sys

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from exstruct_spark.kernels.extract import extract_document  # noqa: E402
from exstruct_spark.pages import build_page  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    h = hashlib.sha256()
    for i in range(n):
        d = build_page(i)
        r = extract_document(d["url"], d["html"])
        h.update(json.dumps(r, sort_keys=True, ensure_ascii=False,
                            default=str).encode())
    print(f"docs={n} digest={h.hexdigest()}")


if __name__ == "__main__":
    main()

"""Regenerate the golden-frame corpus (tests/golden/*.bin).

Run ONLY when the frame format version is intentionally bumped — the
point of the corpus is that frames written at older revisions must keep
decoding (see tests/golden_defs.py). After regenerating, note the format
change in the commit message.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import pyarrow as pa  # noqa: E402

from parquet_go_spark import chunk  # noqa: E402
import golden_defs  # noqa: E402


def main() -> None:
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    for name, (build, kw) in golden_defs.CASES.items():
        arr = build()
        kw = dict(kw)
        page_rows = kw.pop("page_rows", None)
        if page_rows:
            blob, meta = chunk.encode_chunk_paged(
                pa.chunked_array([arr]), page_rows=page_rows, **kw
            )
        else:
            blob, meta = chunk.encode_chunk(pa.chunked_array([arr]), **kw)
        path = os.path.join(out_dir, f"{name}.bin")
        with open(path, "wb") as f:
            f.write(blob)
        print(f"{name:24s} {len(blob):8d} bytes  codec={meta.get('codec')}")


if __name__ == "__main__":
    main()

"""parquet_go_spark — a from-scratch PySpark-native per-column
lightweight-compression engine with the capabilities of hangxie/parquet-go's
encoding layer (reference: /root/reference, studied read-only).

Layers (bottom-up):
  codecs/    pure-numpy encoding kernels (PLAIN, bit-pack, RLE/bit-packed
             hybrid, DELTA_BINARY_PACKED, DELTA_[LENGTH_]BYTE_ARRAY,
             BYTE_STREAM_SPLIT, dictionary, FSST)
  cost.py    sampled cost-based codec auto-selection
  frame.py   self-describing frame container (header + sections + CRC +
             optional block compression), the analog of a Parquet page
  chunk.py   typed column-chunk encode/decode on top of frames
  sources/   deterministic synthetic token-sequence generator
  operators/ Spark jobs: skew-aware encode, decode, verification,
             dedup / similarity / text-analysis pipeline operators
  plans/     partition planning (n_tok-weighted salted bucketing)
  streaming/ micro-batch streaming encode (foreachBatch)

Design notes: all kernels are vectorized numpy/Arrow — no per-row Python in
any hot path; Spark-side fan-out uses DataFrame ops + applyInPandas only.
"""

__version__ = "0.1.0"

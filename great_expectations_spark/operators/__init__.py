"""Training-data pipeline operators (large-scale corpus curation).

Beyond the reference's expectation catalog, these are the data-processing
operators a 100 TB training-data pipeline needs, each expressed Spark-first:

- :mod:`dedup` — exact, MinHash+LSH, SimHash, n-gram Jaccard,
  embedding-cosine near-duplicate detection
- :mod:`similarity` — brute-force / LSH-bucketed / IVF approximate
  nearest-neighbor search over embedding columns
- :mod:`textstats` — language ID, quality scoring, token counting,
  document fingerprinting, Gopher-style repetition profiling
- :mod:`decontamination` — benchmark n-gram overlap detection
  (GPT-3-style 13-gram decontamination; broadcast benchmark side)
- :mod:`multimodal` — binary media columns: decode / resize /
  frame-sample plumbing (Arrow ``mapInPandas``; codecs stubbed in-sandbox)

All hot paths are JVM-side (built-in + higher-order functions); Python
appears only as Arrow-batched ``mapInPandas`` where a codec is inherently
out-of-JVM.
"""

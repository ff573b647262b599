"""Training-data pipeline operators over the documents/embeddings tables:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH ANN), text analysis
(lang-id, quality, token counts, fingerprints), multimodal plumbing."""

from kafka_delta_ingest_spark.operators.text import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from kafka_delta_ingest_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from kafka_delta_ingest_spark.operators.similarity import (  # noqa: F401
    ann_bruteforce,
    ann_lsh,
    cosine_sim,
)

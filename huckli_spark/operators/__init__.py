"""Large-scale training-data-pipeline operators.

- ``dedup``      — exact, n-gram Jaccard, bag-of-words fingerprint
- ``sketch``     — MinHash+LSH and SimHash near-duplicate detection
- ``simsearch``  — cosine similarity search over embedding columns
- ``textstats``  — token counting, quality scoring, language ID
- ``multimodal`` — binary-column (image/audio/video) plumbing
"""

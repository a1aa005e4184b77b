"""From-scratch main-content extractor (the in-cluster replacement for the
reference's remote OCR call, /root/reference/src/mistral_ocr/simple_client.py:733-737).

Pure functions only: ``extract(html_bytes)`` is a deterministic function of
the input bytes + EXTRACTOR_VERSION — the byte-identity contract of the
north rule depends on it. No cross-row state, no wall-clock, no randomness.
"""

from mistral_ocr_spark.extractor.core import ExtractResult, extract

__all__ = ["ExtractResult", "extract"]

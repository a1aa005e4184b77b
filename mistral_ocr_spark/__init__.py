"""mistral_ocr_spark — a PySpark-native document-extraction engine.

A from-scratch, in-cluster re-expression of the capability surface of the
reference CLI client (stevegsax/mistral-ocr: submit / track / retrieve /
search of per-document text extraction — see SURVEY.md). The remote OCR
call becomes a deterministic, vectorized main-content extractor running
inside Spark executors over Arrow batches; the SQLite job/result/lineage
store becomes Spark tables behind an atomic-manifest table format; the CLI
verbs become Spark SQL queries.

Design tenets (scale-first):
- DataFrame/SQL plans everywhere; Catalyst does pushdown/pruning/join
  selection. Python only inside ``mapInArrow`` batches (never per-row UDFs).
- Explicit skew handling: salted repartition on url-host hash.
- Idempotent, checkpoint-resumable commits: per-chunk atomic manifest
  covering data + lineage, so a killed job resumes exactly-once per url.
"""

EXTRACTOR_VERSION = "1.6.0"  # 1.6.0: PDF cross-reference parsing (xref streams + classic tables + /Prev chains + hybrid /XRefStm; current-body authority over the byte scan) + /Length-bounded stream payloads + complete-stream Flate acceptance; 1.5.0: PDF stream-filter cascade (ASCIIHex/ASCII85/RunLength/LZW) + encoded-body excision in the fallback scan; 1.4.0: ToUnicode CMaps + UTF-16BE; 1.3.0: page-tree ordering (ObjStm); 1.2.1: TJ kern fix

__all__ = ["EXTRACTOR_VERSION"]

"""pdf_extraction_ray — a Ray-Data-native main-content extraction engine.

A from-scratch rebuild of the data-processing core of
``TheophilusChinomona/PDF-EXTRACTION`` (reference snapshot at
``/root/reference``) on top of ``ray.data``:

* content-type sniffing + validation  (reference: app/services/file_validator.py:32-81)
* HTML boilerplate stripping via DOM heuristics (readability/trafilatura-style,
  stdlib only)                         (reference core stage analog:
                                        app/services/opendataloader_extractor.py:83-201)
* PDF layout parsing with reading-order sort over a tractable uncompressed
  PDF subset                           (same analog)
* quality scoring + two-route dispatch (reference: opendataloader_extractor.py:18-80,
                                        pdf_extractor.py:451)
* doc-type classification cascade      (reference: app/services/document_classifier.py)
* exact dedup / first-wins             (reference: migrations/006_add_constraints_and_indexes.sql)
* url-hash partitioning, skew splitting of oversized PDFs into page ranges,
  groupby-url reassembly, per-partition checkpoint manifests (north rule)

plus the large-scale training-data operators (near-dedup, similarity search,
text analytics, windowed aggregates) the reference never had but a 100 TB
pipeline needs.

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned by the
caller (driver / bench.py / test fixtures).
"""

__version__ = "0.1.0"

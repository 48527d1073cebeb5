"""Pure, deterministic per-document functions (no Ray imports).

These are the serial "oracle" implementations: the Ray pipeline in
``pdf_extraction_ray.pipelines`` calls exactly these functions inside
``map_batches`` actors, so byte-identical-per-url equality between the
distributed run and a serial loop is equality by construction — what the
north rule's golden diff suite asserts.
"""

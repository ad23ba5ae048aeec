"""Per-family pipeline modules (split out of ``server.py``, round 5).

Importing a module registers its pipelines with the shared registry in
``sequitr_tpu.server.server``; ``server.py`` imports all of them at the
bottom, so constructing an ``ImageServer`` always sees the full registry.
"""

from kgpipe.oracle.reference_semantics import oracle_triples  # noqa: F401

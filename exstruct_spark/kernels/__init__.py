"""Pure pandas/numpy extraction kernels.

Every kernel is a plain Python/pandas function with no Spark dependency so
it can be (a) unit-tested without a JVM and (b) shared verbatim between the
single-process reference extractor (golden fixtures) and the Spark
``mapInPandas`` stages — the mechanism that makes byte-identical output
achievable by construction (SURVEY.md §7.4 hard-part 1).
"""

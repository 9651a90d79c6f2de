"""Pure-Python semantic kernels.

Everything in this subpackage is Spark-free so the same code runs inside
Arrow-batched pandas UDFs on executors and inside plain-Python unit tests.
All pattern/dictionary configuration lives at module level so each Python
worker compiles it exactly once per process (shipped via --py-files).
"""

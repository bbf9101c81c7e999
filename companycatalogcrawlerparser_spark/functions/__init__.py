"""Spark Column-expression implementations of the reference semantics.

Everything here is native ``pyspark.sql.functions`` — JVM-side, whole-stage
codegen eligible, no Python in the hot path. Parity with the pure-Python
oracle (``..refsem``) is enforced by tests on adversarial inputs.
"""

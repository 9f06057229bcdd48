"""Composite DataFrame operators: dedup, similarity search, relational
extensions — each built from DataFrame primitives so Catalyst plans them
(broadcasts, AQE, pushdown) like any other query.
"""

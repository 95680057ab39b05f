"""Reusable column-expression builders (all JVM-side, no Python UDFs)."""

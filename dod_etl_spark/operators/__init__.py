"""Relational operator library.

Each operator is a pure DataFrame -> DataFrame function so the same code
path serves batch and Structured Streaming (stream-static joins keep
these valid on streaming inputs).
"""

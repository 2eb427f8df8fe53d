"""Blockchain-domain queries (classify → extract → views) exposed to
the correctness gate.

The driver testdata has no chain-shaped tables, so these queries first
derive a deterministic synthetic chain FROM the driver tables (same
derivation in the DuckDB oracle), then run the engine's operators on
it. Populated in phase 2 of the build; the chain operators themselves
live in operators/{classify,extract,views}.py with pytest fixtures.
"""

"""Sinks: idempotent upsert tables and checkpoint bookkeeping."""

"""Shim: fixture generation lives in osmesa_spark.datagen (the registry's
OSM-domain queries generate the same deterministic fixtures)."""

from osmesa_spark.datagen import (  # noqa: F401
    COUNTRIES,
    generate_changesets,
    generate_history,
    write_augdiff_dropdir,
    write_fixtures,
)

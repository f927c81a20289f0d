"""Pure per-record functions (the reference's scalar-function tier,
SURVEY.md §2.3) — all deterministic, all callable from inside ``map_batches``
UDFs without any Ray dependency."""

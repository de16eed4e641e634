"""Expression builders: map conditions (§2.3/§2.4) and aggregates (§2.5/§2.6)."""

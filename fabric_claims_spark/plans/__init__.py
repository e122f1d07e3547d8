"""Query plans: star-join builder and the semantic-layer measure
catalog (SURVEY.md §3.3)."""

"""Suite compiler: metric dedup + pass bundling (SURVEY.md §4.1/§4.2)."""

"""Sources: the deterministic synthetic web (webgen) and the pages-table
fetch join ("the corpus is the web")."""

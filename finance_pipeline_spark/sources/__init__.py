"""Edge connectors: CSV (explicit schema + empty guard), REST-JSON
(injectable fetch, offline fixtures), HTML scrape (stdlib parser,
driver-side or mapInPandas-batched)."""

"""twine_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the data-processing capabilities of
bbcarchdev/twine (the BBC "Acropolis" RDF workflow engine), expressed as
streaming ``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

    pages (Parquet)                                # twine:libmq AMQP queue analog
      -> extract_text (stateless map_batches)      # twine:plug-ins/xslt.c analog
      -> mention detection (actor pool)            # spindle:correlate analog
      -> triple extraction (actor pool)            # twine XSLT rules / spindle:generate
      -> entity linking (broadcast/shuffle join)   # spindle coreference lookup
      -> union-find canonicalization (groupby)     # spindle proxy 'sameAs' resolution
      -> property resolution + dedup (groupby)     # spindle:generate property rules
      -> partitioned Parquet triple store          # twine:libtwine/sparql.c PUT analog

See SURVEY.md for the full operator inventory and reference-location map.
The reference checkout at /root/reference was empty at build time (SURVEY.md
paragraph 0), so citations use upstream-relative ``twine:<path>::<symbol>``
form throughout.
"""

__version__ = "0.1.0"

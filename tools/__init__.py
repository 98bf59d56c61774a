"""Builder/driver tooling (ledger, driver_sim, plan audits).

A real __init__ (not a namespace package) so `import tools.ledger` from
__spark_entry__ always resolves to THIS directory: the entry file inserts
the repo root at sys.path[0], and a regular package at position 0 wins
over any same-named package elsewhere on a host's path — a namespace
portion would lose to a regular `tools` package later in sys.path.
"""

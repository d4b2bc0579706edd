"""Ray Data operators: batch transforms and actor-pool stages."""

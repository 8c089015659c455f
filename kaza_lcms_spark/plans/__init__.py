"""Driver-side plan construction: shared derivations + oracle SQL generators."""

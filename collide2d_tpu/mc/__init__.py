"""Monte Carlo collision-probability estimation with adaptive stopping."""

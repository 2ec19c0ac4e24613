"""Solver runtime: equations, time steppers, pressure projection, forcings,
initial conditions, and trajectory rollout."""

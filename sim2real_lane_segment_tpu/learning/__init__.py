"""Learning demos (reference rightLaneDatagen/learning/ parity):
behavior-cloning imitation and DDPG reinforcement learning, JAX-native."""

"""map_batches stage callables: stateless batch fns + actor-pool classes."""

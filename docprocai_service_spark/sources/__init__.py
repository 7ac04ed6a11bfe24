"""Table IO: testdata loaders + checkpoint-manifest store (resume semantics)."""

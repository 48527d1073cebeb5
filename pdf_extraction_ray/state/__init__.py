"""Run state: per-partition checkpoint manifests + resume filtering."""

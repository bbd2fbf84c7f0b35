"""Job-level plumbing: checkpoint/resume manifests and the orderable
correction pipeline (the reference's `correct` step registry)."""

"""Pipeline stages — composable, artifact-compatible with the reference's
8-step ``main.py`` flow plus the nuclei / molecular / morphology / graph
sub-pipelines (SURVEY.md §3 call stacks)."""

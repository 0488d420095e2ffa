"""Plan-level machinery: the superstep runner (checkpoint / metrics /
resume) and plan linting."""

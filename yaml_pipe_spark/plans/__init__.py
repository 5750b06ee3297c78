"""The 'query compiler' shell: YAML spec -> validated plan -> one lazy
DataFrame chain executed by a single write action (SURVEY §2.5, §3.1)."""

"""Host-side tools (L1): camera paths, pose interpolation, mesh extraction,
depth visualization, dataset preparation."""

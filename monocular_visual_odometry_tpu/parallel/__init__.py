"""Device-mesh parallelism: sharded windowed BA and mesh/distributed-init
helpers. The reference has no parallelism of any kind (SURVEY.md §2.3);
this package *introduces* the scaling axis — map-point blocks sharded over
the mesh, reduced camera systems combined with XLA collectives over
ICI/DCN."""

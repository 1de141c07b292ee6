"""Command-line harnesses — the rebuild of the reference's four executables
(CMakeLists.txt:31-52: csv_grid_generator, test_interpolation, test_gebco,
edge_app) plus the masking pipeline and the notebook analysis:

- gen_grid       <- generate_csv_grids.cpp
- bench_grid_a   <- test_interpolation.cpp (Grid A upsampling study)
- bench_grid_b   <- test_gebco.cpp (Grid B masked-fill study)
- demo           <- main.cpp (edge_app)
- subset         <- subset_bathymetry.py
- analyze        <- performance_results.ipynb aggregation
"""

#!/bin/sh
# Build the reference hot loop (reproject.cpp, compiled VERBATIM from
# /root/reference — never copied into this repo) against stub headers for
# its two non-stdlib includes (Tracy zones -> no-ops, nlohmann json ->
# fwd decl only), plus our benchmark driver. -O3 -march=native matches
# the reference release CI's implied x64-avx2 target (build.yml:83).
set -e
cd "$(dirname "$0")"
mkdir -p stubs/tracy stubs/nlohmann build
cat > stubs/tracy/Tracy.hpp <<'H'
#pragma once
// The real Tracy.hpp transitively provides these stdlib headers, which
// reproject.cpp relies on without including them itself.
#include <string>
#include <tuple>
#include <vector>
#include <cstdio>
#define ZoneScoped
#define ZoneScopedN(x)
#define FrameMark
H
cat > stubs/nlohmann/json_fwd.hpp <<'H'
#pragma once
namespace nlohmann { class json; }
H
g++ -O3 -march=native -std=c++17 -I stubs -I /root/reference/src \
    -o build/ref_bench ref_bench.cpp /root/reference/src/reproject.cpp -lpthread
g++ -O3 -march=native -std=c++17 -I stubs -I /root/reference/src \
    -o build/ref_dump ref_dump.cpp /root/reference/src/reproject.cpp
echo built: build/ref_bench build/ref_dump

#!/bin/bash
# Build the reference SLR renderer (CPU, C++11) for the parity harness
# (SURVEY.md stage S0). The source at /root/reference is read-only, so it is
# copied to a scratch tree and patched for this image:
#   * assimp is absent -> stub headers (./assimp); load3DModel fails politely
#     and the parity scenes build geometry in the DSL instead;
#   * OpenEXR 2.2 -> system OpenEXR 3.1 (lib names Half/IlmImf ->
#     Imath/OpenEXR, headers under /usr/include/{Imath,OpenEXR}).
# Output: $BUILD/HostProgram (run from a directory containing the scene's
# relative resource paths).
set -euo pipefail

SRC=/root/reference
WORK=${1:-/tmp/slr_ref}
BUILD=$WORK/build

if [ -x "$BUILD/bin/HostProgram" ] && [ "${FORCE:-0}" != "1" ]; then
    echo "already built: $BUILD/HostProgram"
    exit 0
fi

rm -rf "$WORK"
mkdir -p "$WORK"
cp -r "$SRC/libSLR" "$SRC/libSLRSceneGraph" "$SRC/HostProgram" \
      "$SRC/CMakeLists.txt" "$SRC/TestScenes" "$WORK/"
HERE=$(cd "$(dirname "$0")" && pwd)
mkdir -p "$WORK/extstub"
cp -r "$HERE/assimp" "$WORK/extstub/"

cd "$WORK"

# --- patches ---------------------------------------------------------------
# Library names: OpenEXR 3.x ships OpenEXR/Imath instead of IlmImf/Half and
# there is no system assimp (the stub is header-only).
sed -i 's/set(libs "Half")/set(libs "Imath")/' libSLR/CMakeLists.txt
sed -i 's/set(libs "Assimp;png;Half;IlmImf;SLR")/set(libs "png;Imath;OpenEXR;SLR")/' \
    libSLRSceneGraph/CMakeLists.txt
# libpng's header lives at <png.h> here, not <libpng16/png.h>.
sed -i 's#<libpng16/png.h>#<png.h>#' libSLRSceneGraph/Helper/image_loader.cpp
# gcc has no -stdlib flag (the feature test false-passes).
sed -i 's/ -stdlib=lib[a-z+]*//g' CMakeLists.txt
# The Linux branch of SLR_memalign was left unimplemented upstream
# (defines.h:106-107) — use posix_memalign like the OS X branch.
sed -i 's@#   define SLR_memalign(size, alignment) SLRAssert_NotImplemented@inline void* SLR_memalign(size_t size, size_t alignment) { void* p; if (posix_memalign(\&p, alignment, size)) p = nullptr; return p; }@' libSLR/defines.h
sed -i 's@#   define SLR_freealign(ptr) SLRAssert_NotImplemented@#   define SLR_freealign(ptr) ::free(ptr)\n#   define SLR_alignof(T) alignof(T)@' libSLR/defines.h
# Modern libstdc++ no longer includes <cstring> transitively; -fpermissive
# covers 2015-era two-phase-lookup laxities. -w: this is not our code.
sed -i 's@^add_subdirectory(libSLR)@set(CMAKE_CXX_FLAGS "${CMAKE_CXX_FLAGS} -include cstring -fpermissive -w")\nadd_subdirectory(libSLR)@' CMakeLists.txt
# C++14+ rejects a lambda parameter shadowing a capture (API.cpp:811); the
# parameter wins under the old semantics, so the capture is redundant.
sed -i 's@matProc = \[&pathPrefix, &userMatProc, &context, &err\]@matProc = [\&userMatProc, \&context, \&err]@' libSLRSceneGraph/API.cpp
# Latent upstream UB (found by ASan): createMesh's procMatGroup is a
# *static* lambda capturing stack locals by reference (API.cpp:680), so a
# second call from a different stack depth (e.g. createMesh inside a DSL
# function) reads a stale frame. Drop the static.
sed -i 's@static const auto procMatGroup = \[&resultMatGroup, &err\]@const auto procMatGroup = [\&resultMatGroup, \&err]@' libSLRSceneGraph/API.cpp
# With a Ninja single-config build the exe name collides with the
# HostProgram/ build directory — emit it to bin/ instead.
sed -i 's@set(CMAKE_RUNTIME_OUTPUT_DIRECTORY ${CMAKE_BINARY_DIR})@set(CMAKE_RUNTIME_OUTPUT_DIRECTORY ${CMAKE_BINARY_DIR}/bin)@' HostProgram/CMakeLists.txt
# The top-level lists expect EXTLIBS_* cache vars; feed system paths.
EXR_INC=/usr/include/OpenEXR
IMATH_INC=/usr/include/Imath
STUB_INC=$WORK/extstub

mkdir -p "$BUILD"
cd "$BUILD"
cmake -G Ninja \
    -DCMAKE_BUILD_TYPE=Release \
    -DUSE_LIBCPP=OFF \
    -DEXTLIBS_OpenEXR22_include="$EXR_INC;$IMATH_INC" \
    -DEXTLIBS_OpenEXR22_lib="" \
    -DEXTLIBS_libpng16_include="/usr/include" \
    -DEXTLIBS_libpng16_lib="" \
    -DEXTLIBS_Assimp_include="$STUB_INC" \
    -DEXTLIBS_Assimp_lib="" \
    .. 2>&1 | tail -3
ninja 2>&1 | tail -20
echo "built: $BUILD/bin/HostProgram"

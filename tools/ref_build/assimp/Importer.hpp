// Stub Assimp::Importer — ReadFile always returns nullptr (see scene.h).
#ifndef AI_ASSIMP_HPP_INC
#define AI_ASSIMP_HPP_INC

#include <string>
#include "scene.h"

namespace Assimp {
class Importer {
public:
    const aiScene* ReadFile(const std::string&, unsigned int) {
        return nullptr;
    }
};
}  // namespace Assimp

#endif
